"""Robust-cost kernels shared by all optimizers.

Replaces g2o's RobustKernelHuber + the reference's chi-squared gating
(src/PLPSLAM/optimize/pose_optimizer.cc:117-121: chi2 5.991 mono / 7.815
stereo at 95%).
"""

from __future__ import annotations

import jax.numpy as jnp

CHI2_2D = 5.991  # 95% for 2 DoF (mono reprojection)
CHI2_3D = 7.815  # 95% for 3 DoF (stereo reprojection)


def huber_weight(chi2, delta_sq):
    """IRLS weight for the Huber kernel as a function of squared error.

    rho(e) = e              for e <= delta^2
           = 2 delta sqrt(e) - delta^2 otherwise
    weight = rho'(e) = min(1, delta / sqrt(e)).
    """
    e = jnp.maximum(chi2, 1e-12)
    return jnp.minimum(1.0, jnp.sqrt(delta_sq / e))


def chi2_2d(residual, inv_sigma_sq):
    """Weighted squared error for 2D residuals ``[..., 2]``."""
    return jnp.sum(residual * residual, axis=-1) * inv_sigma_sq


def chi2_3d(residual, inv_sigma_sq):
    return jnp.sum(residual * residual, axis=-1) * inv_sigma_sq
