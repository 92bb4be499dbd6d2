"""Drive the FULL visual capability matrix from a trained-from-images
checkpoint (VERDICT r2 item 5): novel-view spiral, novel-pose sequence,
multi-light sweep incl. OLAT, material/normal/shadow maps, and posed-mesh
extraction — each through the real run.py CLI (SURVEY.md §3.2-3.5 call
stacks), with a handful of renders copied into the git-tracked
``results/<exp>/visual/`` tree as evidence.

Usage (after scripts/train_e2e.py passed its gate):
    python scripts/visual_surface.py --exp tubeman_e2eB [--limit-mb 30]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = 'configs/synthetic/tubeman.yaml'


def geo_opts(exp1):
    return ['use_geometry', 'True',
            'geometry_mesh', f'data/animation/deform/{exp1}/can_mesh.npz',
            'geometry_pretrain', f'data/trained_model/deform/{exp1}']


def tasks(exp1, exp2):
    base = ['run.py', '-t', 'visualize', '-c', CFG, 'relighting', 'True',
            'exp_name', exp2] + geo_opts(exp1)
    return {
        # novel-view spiral through the demo dataset (SURVEY §3.3)
        'novel_view': base + ['vis_novel_view', 'True',
                              'num_render_view', '12'],
        # novel-pose sequence through the pose dataset (SURVEY §3.3)
        'novel_pose': base + ['vis_pose_sequence', 'True',
                              'test.frame_sampler_interval', '5'],
        # light sweep incl. OLAT through the novel-light renderer +
        # light visualizer per-light tree (SURVEY §3.4)
        'novel_light': base + [
            'vis_novel_light', 'True',
            'test_light', "['gym_entrance','city_sky','sunset_road',"
                          "'olat0000-0000','olat0002-0027']",
            'test.frame_sampler_interval', '15'],
        # material / normal / shadow / shading decomposition maps
        'materials': base + [
            'vis_albedo_map', 'True', 'vis_normal_map', 'True',
            'vis_roughness_map', 'True', 'vis_shading_map', 'True',
            'vis_lvis_map', 'True', 'vis_specular_map', 'True',
            'test.frame_sampler_interval', '15'],
        # posed mesh with materials + weight transfer (SURVEY §3.5);
        # mesh extraction runs on the stage-1 geometry network
        'posed_mesh': ['run.py', '-t', 'visualize', '-c', CFG,
                       'exp_name', exp1, 'vis_posed_mesh', 'True',
                       'mesh_simp_face', '16384',
                       'test.frame_sampler_interval', '15'],
    }


def run_task(name, argv, out_dir, evidence_dir, limit_mb):
    log_path = os.path.join(out_dir, f'visual_{name}.log')
    print(f'[visual] {name}: {" ".join(argv)}', flush=True)
    t0 = time.time()
    with open(log_path, 'w') as f:
        p = subprocess.run([sys.executable] + argv, cwd=REPO, stdout=f,
                           stderr=subprocess.STDOUT)
    dt = time.time() - t0
    if p.returncode != 0:
        print(open(log_path).read()[-3000:])
        return dict(name=name, ok=False, sec=round(dt, 1))

    # evidence: newest artifacts under data/ written by this task
    copied, budget = [], limit_mb * 1e6
    exts = ('.png', '.jpg', '.mp4', '.ply')
    hits = []
    for root, _, files in os.walk(os.path.join(REPO, 'data')):
        for fn in files:
            path = os.path.join(root, fn)
            if fn.endswith(exts) and os.path.getmtime(path) >= t0:
                hits.append(path)
    hits.sort()
    dst_dir = os.path.join(evidence_dir, name)
    os.makedirs(dst_dir, exist_ok=True)
    step = max(len(hits) // 8, 1)          # at most ~8 artifacts per task
    for path in hits[::step]:
        size = os.path.getsize(path)
        if budget - size < 0:
            break
        budget -= size
        rel = os.path.relpath(path, os.path.join(REPO, 'data'))
        dst = os.path.join(dst_dir, rel.replace(os.sep, '__'))
        shutil.copy(path, dst)
        copied.append(os.path.relpath(dst, REPO))
    print(f'[visual] {name} ok in {dt / 60:.1f} min, '
          f'{len(hits)} artifacts, kept {len(copied)}', flush=True)
    return dict(name=name, ok=True, sec=round(dt, 1),
                artifacts_total=len(hits), evidence=copied)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--exp', default='tubeman_e2eB')
    ap.add_argument('--limit-mb', type=float, default=6.0,
                    help='evidence size budget per task (repo stays light)')
    ap.add_argument('--only', default='')
    a = ap.parse_args()

    exp1, exp2 = a.exp, a.exp + '_relight'
    out_dir = os.path.join(REPO, 'data/record', exp1)
    evidence_dir = os.path.join(REPO, 'results', exp1, 'visual')
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(evidence_dir, exist_ok=True)

    rows = []
    for name, argv in tasks(exp1, exp2).items():
        if a.only and name != a.only:
            continue
        rows.append(run_task(name, argv, out_dir, evidence_dir, a.limit_mb))

    manifest = os.path.join(evidence_dir, 'manifest.json')
    prev = []
    if os.path.exists(manifest) and a.only:
        with open(manifest) as f:
            prev = [r for r in json.load(f) if r['name'] != a.only]
    with open(manifest, 'w') as f:
        json.dump(prev + rows, f, indent=2)
    print(f'[visual] manifest -> {manifest}')
    if not all(r['ok'] for r in rows):
        raise SystemExit('[visual] some tasks FAILED')


if __name__ == '__main__':
    main()
