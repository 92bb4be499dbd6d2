"""Loss functions for AniSDF and relight training (pure jnp).

Mirrors the reference loss wrappers:
- AniSDF (``lib/train/trainers/base_trainer.py:58-105``): residual norm with
  annealed weight, eikonal (canonical + observed), mask mIoU, rgb MSE + PSNR.
- Relight (``relight_trainer.py:46-118``): + albedo gaussian-entropy sparsity,
  albedo/roughness jitter smoothness L1.
Loss primitive math from ``lib/utils/loss_utils.py``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from relightableavatar_tpu.utils.dotdict import dotdict


def safe_norm(x: jnp.ndarray, axis=-1, eps: float = 1e-12) -> jnp.ndarray:
    """norm with finite gradient at 0 (masked lanes are exactly zero)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis) + eps)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray | None) -> jnp.ndarray:
    if mask is None:
        return jnp.mean(x)
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / (jnp.sum(m) + 1e-8)


def eikonal(grad: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """(..., 3) -> scalar (loss_utils.py:162-163); mean over active lanes."""
    return masked_mean((safe_norm(grad) - 1.0) ** 2, mask)


def mIoU_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """1 - soft IoU (loss_utils.py:223-227)."""
    inter = jnp.sum(pred * gt)
    union = jnp.sum(pred) + jnp.sum(gt) - inter
    return 1.0 - inter / (union + 1e-8)


def gaussian_entropy(albedo: jnp.ndarray, bins: int = 15, sigma: float = 0.1) -> jnp.ndarray:
    """Histogram-entropy sparsity prior on albedo values
    (loss_utils.py:51-76): soft-binned density via gaussian kernels."""
    x = albedo.reshape(-1)
    centers = jnp.linspace(0.0, 1.0, bins)
    w = jnp.exp(-0.5 * ((x[None, :] - centers[:, None]) / sigma) ** 2)
    p = jnp.mean(w, axis=1)
    p = p / (jnp.sum(p) + 1e-8)
    return -jnp.sum(p * jnp.log(p + 1e-8))


def anneal_loss_weight(weight: float, gamma: float, iter_step, milestone: int) -> jnp.ndarray:
    return weight * gamma ** (iter_step // milestone)


def cross_entropy(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Channel-last soft-label CE (loss_utils.py:183-188): logits (..., C)
    vs one-hot/soft target (..., C), mean over lanes."""
    x = logits.reshape(-1, logits.shape[-1])
    y = target.reshape(-1, target.shape[-1])
    logp = jax.nn.log_softmax(x, axis=-1)
    return -jnp.mean(jnp.sum(y * logp, axis=-1))


def anisdf_losses(cfg_w: dotdict, out: dotdict, batch: dotdict, iter_step) -> tuple:
    """Returns (loss, scalar_stats). cfg_w carries the static loss weights."""
    stats = dotdict()
    loss = 0.0

    mask = out.get('reg_mask', None)

    if 'residuals' in out:
        resd_loss = masked_mean(safe_norm(out.residuals), mask)
        w = anneal_loss_weight(cfg_w.resd_loss_weight, cfg_w.resd_loss_weight_gamma,
                               iter_step, cfg_w.resd_loss_weight_milestone)
        stats.resd_loss = resd_loss
        loss += w * resd_loss

    if 'gradients' in out:
        grad_loss = eikonal(out.gradients, mask)
        stats.grad_loss = grad_loss
        loss += cfg_w.eikonal_loss_weight * grad_loss

    if 'observed_gradients' in out:
        ograd_loss = eikonal(out.observed_gradients, mask)
        stats.ograd_loss = ograd_loss
        loss += cfg_w.observed_eikonal_loss_weight * ograd_loss

    if 'acc_map' in out and 'msk' in batch:
        msk_loss = mIoU_loss(out.acc_map, batch.msk)
        stats.msk_loss = msk_loss
        loss += cfg_w.msk_loss_weight * msk_loss

    if cfg_w.silh_loss_weight > 0 and 'msk' in batch:
        # silhouette supervision at the sphere-traced surface (QUALITY_
        # DIAGNOSIS.md unlock #2; no reference counterpart).  The soft-IoU
        # above normalizes by the union, so a thin misplaced-silhouette
        # band contributes almost no gradient; these per-ray losses give
        # each ray full weight.  Gradient flows through the differentiable
        # SDF re-query (the trace stays stop_gradient'ed, reference
        # :593-598).  Two forms:
        # - 'hinge' (default): deadband hinge at the CLOSEST-APPROACH
        #   point — inside rays penalize relu(d) (the ray should touch),
        #   outside rays relu(margin - d) (clearance beyond the AA band).
        #   Correctly classified rays beyond the margin get EXACTLY zero
        #   loss and gradient.
        # - 'bce': sigmoid(-edge_sdf/scale) cross-entropy — run G measured
        #   it NEGATIVE (29.43 -> 24.24 dB): it never saturates at the
        #   zero-crossing (p = 0.5 at d = 0 exerts constant outward
        #   pressure on every correctly-hit ray) and inside-classified
        #   misses push the SDF down at the punched-through far point.
        #   Kept for the record.
        silh_loss = None
        m = batch.msk
        if cfg_w.silh_mode == 'hinge' and 'closest_sdf' in out:
            d = out.closest_sdf
            s = cfg_w.silh_scale
            mg = cfg_w.silh_margin
            # symmetric deadband: refined hit points land at d = +/-eps of
            # either sign, so the inside term must tolerate +margin too —
            # relu(d) alone would pull every d=+eps hit ray inward with the
            # full 1/s gradient, the (attenuated) run-G failure mode.
            # Placement tolerance = margin (2 mm ~ sub-pixel at 512px).
            silh_loss = jnp.mean(
                m * jax.nn.relu(d - mg) / s
                + (1.0 - m) * jax.nn.relu(mg - d) / s)
        elif cfg_w.silh_mode == 'bce' and 'edge_sdf' in out:
            p = jax.nn.sigmoid(-out.edge_sdf / cfg_w.silh_scale)
            silh_loss = jnp.mean(
                -(m * jnp.log(p + 1e-6)
                  + (1.0 - m) * jnp.log(1.0 - p + 1e-6)))
        if silh_loss is not None:
            stats.silh_loss = silh_loss
            loss += cfg_w.silh_loss_weight * silh_loss

    if 'norm_map' in out and 'norm' in batch:
        # view-weighted normal supervision (base_trainer.py:78-88):
        # L1 + (1 - cos) terms, weighted by how front-facing the normal is
        nm = out.norm_map / safe_norm(out.norm_map)[..., None]
        ng = batch.norm / safe_norm(batch.norm)[..., None]
        view_dot = jnp.clip(jnp.sum(nm * (-batch.ray_d), -1), 0.0, 1.0)
        per_ray = (jnp.sum(jnp.abs(nm - ng), -1)
                   + (1.0 - jnp.sum(nm * ng, -1))) * view_dot
        norm_loss = jnp.mean(per_ray)
        stats.norm_loss = norm_loss
        loss += cfg_w.norm_loss_weight * norm_loss

    if 'sem_map' in out and 'sem' in batch:
        sem_loss = cross_entropy(out.sem_map, batch.sem)
        stats.sem_loss = sem_loss
        loss += cfg_w.sem_loss_weight * sem_loss

    if 'rgb_map' in out and 'rgb' in batch:
        img_loss = jnp.mean((out.rgb_map - batch.rgb) ** 2)
        stats.img_loss = img_loss
        stats.psnr = -10.0 * jnp.log(img_loss + 1e-12) / np.log(10.0)
        loss += cfg_w.img_loss_weight * img_loss

    # relight extras
    if 'albedo' in out:
        ent = gaussian_entropy(out.albedo)
        stats.albedo_entropy = ent
        loss += cfg_w.albedo_sparsity * ent
    if 'volume_albedo' in out:
        ent = gaussian_entropy(out.volume_albedo)
        stats.volume_entropy = ent
        loss += cfg_w.albedo_sparsity * ent
    if 'albedo' in out and 'albedo_jitter' in out:
        sm = jnp.mean(jnp.abs(out.albedo - out.albedo_jitter))
        stats.albedo_smooth = sm
        loss += cfg_w.albedo_smooth_weight * sm
    if 'roughness' in out and 'roughness_jitter' in out:
        sm = jnp.mean(jnp.abs(out.roughness - out.roughness_jitter))
        stats.roughness_smooth = sm
        loss += cfg_w.roughness_smooth_weight * sm

    stats.loss = loss
    return loss, stats


def loss_weights_from_cfg(cfg) -> dotdict:
    return dotdict(
        resd_loss_weight=float(cfg.resd_loss_weight),
        resd_loss_weight_gamma=float(cfg.resd_loss_weight_gamma),
        resd_loss_weight_milestone=int(cfg.resd_loss_weight_milestone),
        eikonal_loss_weight=float(cfg.eikonal_loss_weight),
        observed_eikonal_loss_weight=float(cfg.observed_eikonal_loss_weight),
        msk_loss_weight=float(cfg.msk_loss_weight),
        silh_loss_weight=float(cfg.silh_loss_weight),
        silh_scale=float(cfg.silh_scale),
        silh_mode=str(cfg.silh_mode),
        silh_margin=float(cfg.silh_margin),
        sem_loss_weight=float(cfg.sem_loss_weight),
        norm_loss_weight=float(cfg.norm_loss_weight),
        img_loss_weight=float(cfg.img_loss_weight),
        albedo_sparsity=float(cfg.albedo_sparsity),
        albedo_smooth_weight=float(cfg.albedo_smooth_weight),
        roughness_smooth_weight=float(cfg.roughness_smooth_weight),
    )
