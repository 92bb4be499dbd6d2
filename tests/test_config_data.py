"""Config system + dataset layer tests (CPU, no images on disk)."""
import os
import sys

import numpy as np
import pytest

from relightableavatar_tpu.config import default_cfg, make_parser, update_cfg
from relightableavatar_tpu.config.node import CN


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _parse(argv):
    return make_parser().parse_args(argv)


@pytest.fixture()
def synt_root(tmp_path):
    from relightableavatar_tpu.smpl import synthetic
    root = str(tmp_path / "tubeman")
    synthetic.write_synthetic_dataset(root, n_frames=4, n_views=3, n_bones=52,
                                      H=64, W=64)
    return root


def _cfg_for(synt_root, opts=()):
    cfg = default_cfg()
    args = _parse(['-c', os.path.join(REPO, 'configs/synthetic/tubeman.yaml'),
                   '-t', 'visualize',
                   'train_dataset.data_root', synt_root,
                   'test_dataset.data_root', synt_root,
                   *opts])
    os.chdir(REPO)
    update_cfg(cfg, args)
    return cfg


def test_config_parent_chain_and_cli(synt_root):
    cfg = _cfg_for(synt_root, ['H', '32', 'W', '32', 'ratio', '0.5'])
    assert cfg.exp_name == 'tubeman'
    assert cfg.n_samples == 128          # from base.yaml
    assert cfg.H == 32 and cfg.W == 32   # CLI override
    assert cfg.ratio == 0.5
    assert cfg.n_bones == 52             # derived from body_model.npz
    assert cfg.cond_dim == 156
    assert cfg.vis_rendering_map         # default visualization type


def test_config_relighting_overlay(synt_root):
    cfg = _cfg_for(synt_root, ['relighting', 'True'])
    assert cfg.task == 'relight'
    assert cfg.exp_name == 'tubeman_relight'
    assert cfg.renderer_module == 'lib.networks.renderer.sphere_tracing_renderer'
    assert cfg.dist_th == 0.125
    assert cfg.train.lr_table.residual_deformation_network == 5.0e-6
    assert cfg.img_loss_weight == 10.0


def test_config_sphere_tracing_overlay(synt_root):
    cfg = _cfg_for(synt_root, ['vis_sphere_tracing', 'True'])
    assert cfg.n_samples == 3
    assert cfg.renderer_module == 'lib.networks.renderer.sphere_tracing_renderer'


def test_config_novel_light_overlay(synt_root):
    cfg = _cfg_for(synt_root, ['relighting', 'True', 'vis_novel_light', 'True'])
    assert cfg.renderer_module == 'lib.networks.renderer.novel_light_sphere_tracing'
    assert cfg.visualizer_module == 'lib.visualizers.light_visualizer'


def test_config_cli_reapplied_after_overlay(synt_root):
    # CLI opts must win over overlay values (reference config.py:516)
    cfg = _cfg_for(synt_root, ['relighting', 'True', 'dist_th', '0.07'])
    assert cfg.dist_th == 0.07


def test_base_dataset_iteration(synt_root):
    cfg = _cfg_for(synt_root)
    from relightableavatar_tpu.data.datasets import make_dataset
    cfg.n_rays = 64
    ds = make_dataset(cfg, is_train=True)
    assert len(ds) == 4 * 3
    item = ds[0]
    assert item.rgb.shape == (64, 3)
    assert item.ray_o.shape == (64, 3)
    assert 'ctx' in item
    assert np.asarray(item.ctx['pverts']).shape[1] == 3


def test_pose_dataset(synt_root):
    cfg = _cfg_for(synt_root, ['vis_pose_sequence', 'True', 'H', '48', 'W', '48'])
    from relightableavatar_tpu.data.datasets import make_dataset
    ds = make_dataset(cfg, is_train=False)
    item = ds[0]
    assert item.ray_o.shape[-1] == 3
    assert item.mask_at_box.shape == (48, 48)
    assert len(ds) == ds.ni * ds.num_cams


def test_demo_dataset_spiral(synt_root):
    cfg = _cfg_for(synt_root, ['vis_novel_view', 'True', 'H', '48', 'W', '48',
                               'num_render_view', '12'])
    from relightableavatar_tpu.data.datasets import make_dataset
    ds = make_dataset(cfg, is_train=False)
    assert len(ds) == 12
    item = ds[5]
    assert item.mask_at_box.shape == (48, 48)
    # spiral w2c must be valid rigid transforms
    R = item.cam_R
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)


def test_mesh_dataset_grid(synt_root):
    cfg = _cfg_for(synt_root, ['vis_can_mesh', 'True',
                               'voxel_size', '[0.05,0.05,0.05]'])
    from relightableavatar_tpu.data.datasets import make_dataset
    ds = make_dataset(cfg, is_train=False)
    item = ds[-1]  # canonical
    assert item.pts.ndim == 4
    assert item.pts.shape[-1] == 3


def test_frame_sampler(synt_root):
    cfg = _cfg_for(synt_root, ['vis_pose_sequence', 'True'])
    from relightableavatar_tpu.data.datasets import FrameSampler, make_dataset
    ds = make_dataset(cfg, is_train=False)
    s = FrameSampler(ds, frame_sampler_interval=2, view_sampler_interval=1)
    assert len(s) > 0
    assert max(s.inds) < len(ds)


def test_lighting_probes(synt_root):
    cfg = _cfg_for(synt_root, ['test_light', "['gym_entrance','olat0002-0000']",
                               'olats', '[64]'])
    from relightableavatar_tpu.data.datasets import load_lighting
    lights = load_lighting(cfg)
    assert 'gym_entrance' in lights
    assert 'olat0002-0000' in lights
    probe = lights['olat0002-0000'].probe
    assert probe.shape == (16, 32, 3)
    # olat: single bright texel + ambient
    assert probe.max() >= cfg.olat_inten
    assert np.isclose(probe.min(), cfg.ambient_inten)


def test_train_sampler_cycles_shards_and_epoch_seeds():
    from relightableavatar_tpu.data.datasets import TrainSampler
    s = TrainSampler(10, shuffle=True, seed=1, rank=0, world=1)
    it = iter(s)
    first_pass = [next(it) for _ in range(10)]
    second_pass = [next(it) for _ in range(10)]   # cycles past dataset size
    assert sorted(first_pass) == list(range(10))
    assert sorted(second_pass) == list(range(10))
    assert first_pass != second_pass              # reshuffled per pass
    s.epoch = 1
    other = [next(iter(s)) for _ in range(1)]
    s.epoch = 0
    again = [next(iter(s)) for _ in range(1)]
    assert again[0] == first_pass[0]              # epoch-seeded determinism
    # rank sharding covers the dataset disjointly
    a = TrainSampler(10, shuffle=True, seed=1, rank=0, world=2)
    b = TrainSampler(10, shuffle=True, seed=1, rank=1, world=2)
    ia, ib = iter(a), iter(b)
    pa = [next(ia) for _ in range(5)]
    pb = [next(ib) for _ in range(5)]
    assert sorted(pa + pb) == list(range(10))


def test_image_size_batching_varies_host_size_keeps_ray_count(synt_root):
    """ImageSizeBatchSampler equivalent: per-batch (H, W) drawn and rounded
    to 32-divisors; n_rays stays fixed so device shapes never change
    (reference samplers.py:11-46)."""
    from relightableavatar_tpu.data.datasets import make_data_loader
    cfg = _cfg_for(synt_root, ['n_rays', '64',
                               'train.batch_size', '2',
                               'train.batch_sampler', 'image_size',
                               'train.sampler_meta.min_hw', '[96,96]',
                               'train.sampler_meta.max_hw', '[256,256]'])
    loader = make_data_loader(cfg, is_train=True, max_iter=6)
    sizes = []
    for item in loader:
        assert item.ray_o.shape == (64, 3)
        assert item.img.shape[0] % 32 == 0 and item.img.shape[1] % 32 == 0
        sizes.append(item.img.shape[:2])
    assert len(sizes) == 6
    assert len(set(sizes)) > 1, sizes       # sizes actually vary
    assert sizes[0] == sizes[1]             # constant within a batch
    assert all(96 <= h <= 288 for h, w in sizes)


def test_threaded_loader_deterministic(synt_root):
    """The threaded prefetch loader passes its sequence number into
    __getitem__ as the RNG draw, so the sampled rays for step k do not
    depend on worker-thread completion order: two identical runs yield
    byte-identical batches."""
    from relightableavatar_tpu.data.datasets import make_data_loader
    def grab(n=8):
        cfg = _cfg_for(synt_root, ['n_rays', '64', 'train.num_workers', '4'])
        loader = make_data_loader(cfg, is_train=True, max_iter=n)
        loader.set_epoch(0)
        return [item for item in loader]
    a, b = grab(), grab()
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x.coord, y.coord)
        np.testing.assert_array_equal(x.rgb, y.rgb)
        np.testing.assert_array_equal(np.asarray(x.ray_o), np.asarray(y.ray_o))


def test_eval_crop_bbox_with_mask_crop_is_exclusive(synt_root):
    """crop_bbox paste-back and the eval_whole_img=False mask crop must not
    compose: fill_image needs the raw crop-extent render (the combination
    would crash or silently misalign pixels)."""
    from relightableavatar_tpu.eval.evaluator import Evaluator
    from relightableavatar_tpu.utils.dotdict import dotdict
    cfg = _cfg_for(synt_root)
    cfg.eval_whole_img = False
    cfg.result_dir = os.path.join(cfg.result_dir, 'crop_bbox_test')
    ev = Evaluator(cfg)
    H = W = 32
    mab = np.zeros((H, W), bool)
    mab[8:20, 10:22] = True          # mask bbox strictly inside crop_bbox
    n = int(mab.sum())
    rng = np.random.default_rng(0)
    rgb = rng.uniform(0.2, 0.9, (n, 3)).astype(np.float32)
    batch = dotdict(rgb=rgb, mask_at_box=mab.reshape(-1), H=H, W=W,
                    crop_bbox=np.array([[4, 4], [28, 28]]),
                    orig_H=48, orig_W=48, meta=dotdict(frame_index=0))
    out = dotdict(rgb_map=rgb + 0.01)
    ev.evaluate(out, batch)          # must not raise / misalign
    assert len(ev.psnrs) == 1 and np.isfinite(ev.psnrs[0])


def test_undistortion_applied_when_D_nonzero(synt_root, tmp_path):
    """Nonzero distortion coefficients trigger cv2.undistort on image+mask
    (reference base_dataset.py:279-306); zero D is a no-op."""
    import shutil
    import numpy as np
    root2 = str(tmp_path / 'distorted')
    shutil.copytree(synt_root, root2)
    # the tiny fixture has no images on disk; paint a gradient so the
    # warp is observable
    import cv2
    ds_probe = None
    from relightableavatar_tpu.data.datasets import make_dataset
    cfg_probe = _cfg_for(synt_root, ['train_dataset.data_root', root2,
                                     'test_dataset.data_root', root2])
    ds_probe = make_dataset(cfg_probe, is_train=False)
    img_rel = ds_probe.ims[0]
    yy, xx = np.meshgrid(np.arange(64), np.arange(64), indexing='ij')
    pattern = np.stack([xx, yy, (xx + yy) // 2], -1).astype(np.uint8) * 3
    for root in (synt_root, root2):
        p = os.path.join(root, img_rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        cv2.imwrite(p, pattern)
    ann = np.load(os.path.join(root2, 'annots.npy'), allow_pickle=True).item()
    D = np.asarray(ann['cams']['D'], np.float64)
    D[:] = 0.0
    ann['cams']['D'] = D
    np.save(os.path.join(root2, 'annots.npy'), ann)
    cfg0 = _cfg_for(synt_root)
    ds0 = make_dataset(cfg0, is_train=False)
    img0, msk0 = ds0.get_image_and_mask(0)

    D[:, 0] = -0.3  # strong barrel distortion
    ann['cams']['D'] = D
    np.save(os.path.join(root2, 'annots.npy'), ann)
    cfg1 = _cfg_for(synt_root, ['train_dataset.data_root', root2,
                                'test_dataset.data_root', root2])
    ds1 = make_dataset(cfg1, is_train=False)
    img1, msk1 = ds1.get_image_and_mask(0)
    assert img0.shape == img1.shape
    assert np.abs(img0 - img1).max() > 0.01, "undistort must change the image"


# ---------------------------------------------------------------- catalog
def _catalog():
    import glob
    return sorted(glob.glob(os.path.join(REPO, 'configs', '*', '*.yaml')))


def test_catalog_matches_reference_count():
    """Every reference experiment YAML has a counterpart (47 reference
    configs + the synthetic tubeman flagship)."""
    names = {os.path.basename(p) for p in _catalog()}
    ref = '/root/reference/configs'
    if os.path.isdir(ref):
        import glob
        missing = {os.path.basename(p)
                   for p in glob.glob(os.path.join(ref, '*', '*.yaml'))} - names
        assert not missing, f'missing reference configs: {sorted(missing)}'
    assert len(names) >= 47  # 46 reference experiments + synthetic tubeman


@pytest.mark.parametrize('path', _catalog(), ids=os.path.basename)
def test_catalog_parses_and_builds(path):
    """Parse + overlay-merge + registry-resolve every experiment config
    (the reference's importlib module strings must resolve)."""
    import relightableavatar_tpu.models.factory  # noqa: registry side effects
    import relightableavatar_tpu.data.datasets   # noqa
    import relightableavatar_tpu.eval.evaluator  # noqa
    import relightableavatar_tpu.train.trainer   # noqa
    from relightableavatar_tpu.utils.registry import resolve
    cfg = default_cfg()
    args = _parse(['-c', path, '-t', 'visualize', 'relighting', 'True'])
    os.chdir(REPO)
    update_cfg(cfg, args)
    assert cfg.exp_name
    assert cfg.task == 'relight'
    # networks dispatch through make_network (stage from the module string)
    assert cfg.network_module in ('lib.networks.deform.base_network',
                                  'lib.networks.relight.relight_network')
    # trainers dispatch on the relight flag inside train/loss.py
    assert cfg.trainer_module in ('lib.train.trainers.base_trainer',
                                  'lib.train.trainers.relight_trainer')
    for kind, key in [('renderer', cfg.renderer_module),
                      ('evaluator', cfg.evaluator_module),
                      ('visualizer', cfg.visualizer_module),
                      ('dataset', cfg.test_dataset_module)]:
        assert resolve(kind, key) is not None, (kind, key)
    # geo experiments carry the geometry-prior wiring
    if path.endswith('_geo.yaml') and 'synthetic_human' in path:
        assert cfg.use_geometry
        assert cfg.geometry_mesh.endswith('can_mesh.npz')


def test_maybe_init_distributed_env_gating(monkeypatch):
    """Multi-host init fires only under the launcher env vars and passes the
    topology through (reference torchrun equivalent, train.py:116-122)."""
    from relightableavatar_tpu import config as cfg_mod
    calls = []
    import jax
    monkeypatch.setattr(jax.distributed, 'initialize',
                        lambda **kw: calls.append(kw))
    cfg_mod.maybe_init_distributed()
    assert calls == []  # no env vars -> no init
    monkeypatch.setenv('RA_COORDINATOR', 'h:1234')
    monkeypatch.setenv('RA_NUM_PROCESSES', '4')
    monkeypatch.setenv('RA_PROCESS_ID', '2')
    cfg_mod.maybe_init_distributed()
    assert calls and calls[-1] == dict(coordinator_address='h:1234',
                                       num_processes=4, process_id=2)


def test_cached_train_sampler_matches_uncached(synt_root):
    """The host-cache fast path (_train_ray_geometry + _sample_ray_cached)
    must reproduce rays.sample_ray exactly for the same rng stream — same
    pools, same draw order (data/datasets.py host-cache redesign; the
    uncached path re-derives full-image grids per draw, ~1.7 s/item at
    512px on a 1-core host vs ~2 ms cached)."""
    import numpy as np
    from relightableavatar_tpu.data import rays as ray_utils
    from relightableavatar_tpu.data.datasets import make_dataset
    cfg = _cfg_for(synt_root)
    ds = make_dataset(cfg, is_train=True)
    ret = ds.get_gt(2)
    rng1 = np.random.default_rng((0, 2, 5))
    rng2 = np.random.default_rng((0, 2, 5))
    slow = ray_utils.sample_ray(
        ret.img, ret.msk, ret.cam_K, ret.cam_R, ret.cam_T, ret.wbounds,
        cfg.n_rays, 'train', cfg.subpixel_sample,
        cfg.body_sample_ratio, cfg.face_sample_ratio, rng=rng1)
    geom = ds._train_ray_geometry(2, ret)
    assert geom is not None
    fast = ds._sample_ray_cached(geom, ret.img, cfg.n_rays,
                                 cfg.body_sample_ratio,
                                 cfg.face_sample_ratio, rng2)
    for i, (a, b) in enumerate(zip(slow, fast)):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape, (i, a.shape, b.shape)
        np.testing.assert_allclose(a.astype(np.float64),
                                   b.astype(np.float64), atol=1e-6)

    # edge_sample_ratio: cached == uncached with the silhouette-band pool,
    # and the drawn edge rays actually live in the band
    cfg.edge_sample_ratio = 0.25
    ds2 = make_dataset(cfg, is_train=True)
    ret2 = ds2.get_gt(2)
    rng1 = np.random.default_rng((0, 2, 5))
    rng2 = np.random.default_rng((0, 2, 5))
    slow = ray_utils.sample_ray(
        ret2.img, ret2.msk, ret2.cam_K, ret2.cam_R, ret2.cam_T, ret2.wbounds,
        cfg.n_rays, 'train', cfg.subpixel_sample,
        cfg.body_sample_ratio, cfg.face_sample_ratio, rng=rng1,
        edge_ratio=cfg.edge_sample_ratio, edge_band_px=cfg.edge_band_px)
    geom2 = ds2._train_ray_geometry(2, ret2)
    fast = ds2._sample_ray_cached(geom2, ret2.img, cfg.n_rays,
                                  cfg.body_sample_ratio,
                                  cfg.face_sample_ratio, rng2,
                                  cfg.edge_sample_ratio)
    for i, (a, b) in enumerate(zip(slow, fast)):
        np.testing.assert_allclose(np.asarray(a, np.float64),
                                   np.asarray(b, np.float64), atol=1e-6,
                                   err_msg=f'edge path field {i}')
    band = ray_utils.edge_band_coords(
        ret2.msk * np.asarray(geom2.mask_at_box), geom2.mask_at_box,
        cfg.edge_band_px)
    band_set = {tuple(c) for c in band}
    n_body = int(cfg.n_rays * cfg.body_sample_ratio)
    n_edge = int(cfg.n_rays * cfg.edge_sample_ratio)
    edge_coords = np.asarray(fast[5])[n_body:n_body + n_edge]
    assert n_edge > 0 and all(tuple(c) in band_set for c in edge_coords)
    cfg.edge_sample_ratio = 0.0
    # budget exhaustion: the already-computed entry is still returned for a
    # one-shot use (rng-order-identical to the fallback) but NOT retained
    ds._cache_budget = 0
    ds._ray_cache.clear()
    g2 = ds._train_ray_geometry(2, ret)
    assert g2 is not None and len(ds._ray_cache) == 0
    # the image cache returns the identical decoded arrays on a second hit
    img1, msk1 = ds.get_image_and_mask(2)
    ds._cache_budget = 1 << 30
    img2, msk2 = ds.get_image_and_mask(2)
    img3, msk3 = ds.get_image_and_mask(2)
    assert img3 is img2 and msk3 is msk2
    np.testing.assert_array_equal(img1, img2)
