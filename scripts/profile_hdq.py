"""Micro-bench of HDQ SDF query components, sync-overhead-free.

The axon tunnel adds ~30 ms to every ``block_until_ready`` (pure host<->device
sync latency, independent of the computation).  Each candidate is therefore
run R times inside ONE jitted ``lax.scan`` and the per-iteration time reported
(total / R), which amortizes the sync to noise.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from relightableavatar_tpu.config import default_cfg
    from relightableavatar_tpu.models import anisdf
    from relightableavatar_tpu.models.anisdf import AniSDFConfig
    from relightableavatar_tpu.models.context import make_bigpose, make_frame_context
    from relightableavatar_tpu.smpl.body_model import BodyModel
    from relightableavatar_tpu.train.checkpoints import load_params
    from relightableavatar_tpu.ops import lbs

    model = BodyModel("fixtures/synthetic_body.npz")
    motion = dict(np.load("fixtures/synthetic_motion.npz"))
    shapes = motion["shapes"][0]
    tverts, tjoints, big_A, _ = make_bigpose(model, shapes)
    ctx = make_frame_context(model, tverts, tjoints, big_A,
                             motion["poses"][0], motion["Rh"][0],
                             motion["Th"][0], shapes)

    cfg = default_cfg()
    cfg.n_bones = model.n_bones
    cfg.cond_dim = model.n_bones * 3
    cfg.relighting = True
    cfg.dist_th = 0.125
    mcfg = AniSDFConfig.from_cfg(cfg)._replace(sdf_res=8, bf16=True)
    params = load_params(anisdf.init_anisdf(jax.random.PRNGKey(0), mcfg),
                         "fixtures/synthetic_avatar_params.npz")

    P = 32768
    R = 50
    wb = np.asarray(ctx["wbounds"])
    x = jax.device_put(np.random.RandomState(0).uniform(
        wb[0], wb[1], (P, 3)).astype(np.float32))

    def bench(name, fn):
        """fn: (P,3) -> array; scanned R times with a data dependency."""
        def body(carry, _):
            out = fn(carry)
            # fold the output back into the carry so iterations serialize
            bump = (jnp.sum(out.astype(jnp.float32)) * 0).astype(carry.dtype)
            return carry + bump, None
        f = jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=R)[0])
        jax.block_until_ready(f(x))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(x))
            ts.append(time.perf_counter() - t0)
        per = (min(ts) - 0.030) / R * 1e3   # subtract sync latency
        print(f"{name:38s} {per:8.3f} ms/iter  ({P/ (per/1e3) /1e6:7.1f} Mpts/s)")
        return per

    th = 0.05  # obj_lvis dist_th
    K = mcfg.sample_vert_cnt

    full = bench("full hdq_sdf", lambda x: anisdf.hdq_sdf(
        params, mcfg, ctx, x, smooth_transition=True, dist_th=th))

    from relightableavatar_tpu.ops.knn import knn_select
    bench("knn_select (bf16 d2 + approx_min_k)",
          lambda x: knn_select(x, ctx["pverts"], K=K).astype(jnp.float32))

    try:
        from relightableavatar_tpu.ops.pallas_knn import knn_pallas
        bench("pallas knn", lambda x: knn_pallas(
            x, ctx["pverts"], K=K)[1].astype(jnp.float32))
    except Exception as e:
        print("pallas knn: ", repr(e)[:100])

    def knn_stage(x):
        ppts = lbs.world_points_to_pose_points(x, ctx["R"], ctx["Th"])
        return anisdf._hdq_knn_stage(mcfg, ctx, ppts, th, K)[0]
    knn_t = bench("knn stage (select+gather+filter)", knn_stage)

    def warp_stage(x):
        ppts = lbs.world_points_to_pose_points(x, ctx["R"], ctx["Th"])
        d2, nn, sdf_k, mask, smpl_sdf, bw_k = anisdf._hdq_knn_stage(
            mcfg, ctx, ppts, th, K)
        return anisdf._hdq_warp_stage(mcfg, ctx, ppts, d2, nn, bw_k=bw_k)[1]
    warp_t = bench("knn + warp stage", warp_stage)

    cond = jnp.broadcast_to(anisdf.condition_vector(ctx)[None, :],
                            (P, mcfg.cond_dim))
    bench("residual MLP", lambda x: anisdf.residuals(params, mcfg, x, cond))
    bench("sdf MLP", lambda x: anisdf.sdf_feat(params, mcfg, x)[0])

    print(f"\nwarp-only (diff): {warp_t - knn_t:.3f} ms")
    print(f"full - (knn+warp): {full - warp_t:.3f} ms  (= MLPs + blend)")


if __name__ == "__main__":
    main()
