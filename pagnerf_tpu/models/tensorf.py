"""TensoRF VM-decomposition grid.

TPU-native equivalent of the reference's ``VMSplitFeatureVolume`` / ``TensoRF`` grid
(/root/reference/grids/tensorf.py:28-126): three plane+line factor pairs for density
(16 components) and appearance (48 components -> 27-d via a learned basis matmul),
bilinearly interpolated. Progressive upsampling (128 -> 192 over num_resolution steps,
tensorf.py:111-126) is a pure functional transform on the parameter pytree
(``upsample_vm_params``) — the trainer re-jits after each resolution step, mirroring
the reference's optimizer re-init (pc_nerf/trainer.py:348-358).

TPU notes: ``grid_sample`` is replaced by explicit gather + bilinear weights on the
planes and linear interpolation on the lines; the basis projection is one [N, 3C] x
[3C, 27] matmul that rides the MXU.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# plane axis pairs and complementary line axes (reference tensorf.py:51-52)
_MAT_MODE = ((0, 1), (0, 2), (1, 2))
_VEC_MODE = (2, 1, 0)


def _bilinear_plane(plane: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """plane [C, R, R], uv [N, 2] in [-1, 1] (align_corners=True) -> [C, N]."""
    r = plane.shape[-1]
    g = (uv + 1.0) * 0.5 * (r - 1)
    g0 = jnp.clip(jnp.floor(g).astype(jnp.int32), 0, r - 2)
    f = g - g0
    fx, fy = f[:, 0], f[:, 1]
    # reference uses grid_sample with (x, y) = (first coord -> width, second -> height):
    # plane is indexed [C, y, x].
    x0, y0 = g0[:, 0], g0[:, 1]
    p00 = plane[:, y0, x0]
    p01 = plane[:, y0, x0 + 1]
    p10 = plane[:, y0 + 1, x0]
    p11 = plane[:, y0 + 1, x0 + 1]
    return (p00 * (1 - fx) * (1 - fy) + p01 * fx * (1 - fy)
            + p10 * (1 - fx) * fy + p11 * fx * fy)


def _linear_line(line: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """line [C, R], w [N] in [-1, 1] (align_corners=True) -> [C, N]."""
    r = line.shape[-1]
    g = (w + 1.0) * 0.5 * (r - 1)
    g0 = jnp.clip(jnp.floor(g).astype(jnp.int32), 0, r - 2)
    f = g - g0
    return line[:, g0] * (1 - f) + line[:, g0 + 1] * f


class TensoRFGrid(nn.Module):
    """VM-split feature volume (reference grids/tensorf.py:28-126).

    ``__call__`` returns (sigma_feature [N], app_feature [N, app_dim]).
    """

    density_n_comp: int = 16
    app_n_comp: int = 48
    resolution: int = 128
    app_dim: int = 27
    init_scale: float = 0.1

    # feature-grid protocol: used when a TensoRF grid is plugged where a cat-feature
    # grid is expected; sigma feature + app features are concatenated.
    num_lods: int = 1
    feature_dim: int = 28

    @property
    def output_dim(self) -> int:
        return 1 + self.app_dim

    def setup(self):
        r = self.resolution

        def norm_init(scale):
            def init(key, shape):
                return scale * jax.random.normal(key, shape)
            return init

        self.density_plane = self.param("density_plane", norm_init(self.init_scale),
                                        (3, self.density_n_comp, r, r))
        self.density_line = self.param("density_line", norm_init(self.init_scale),
                                       (3, self.density_n_comp, r))
        self.app_plane = self.param("app_plane", norm_init(self.init_scale),
                                    (3, self.app_n_comp, r, r))
        self.app_line = self.param("app_line", norm_init(self.init_scale),
                                   (3, self.app_n_comp, r))
        self.basis_mat = nn.Dense(self.app_dim, use_bias=False, name="basis_mat")

    def density_feature(self, coords: jnp.ndarray) -> jnp.ndarray:
        """[N, 3] -> [N] sigma feature (reference compute_densityfeature,
        tensorf.py:73-88)."""
        sigma = jnp.zeros(coords.shape[0], coords.dtype)
        for i in range(3):
            uv = coords[:, _MAT_MODE[i]]
            w = coords[:, _VEC_MODE[i]]
            pc = _bilinear_plane(self.density_plane[i], uv)
            lc = _linear_line(self.density_line[i], w)
            sigma = sigma + jnp.sum(pc * lc, axis=0)
        return sigma

    def app_feature(self, coords: jnp.ndarray) -> jnp.ndarray:
        """[N, 3] -> [N, app_dim] (reference compute_appfeature, tensorf.py:91-106)."""
        pcs, lcs = [], []
        for i in range(3):
            uv = coords[:, _MAT_MODE[i]]
            w = coords[:, _VEC_MODE[i]]
            pcs.append(_bilinear_plane(self.app_plane[i], uv))
            lcs.append(_linear_line(self.app_line[i], w))
        pc = jnp.concatenate(pcs, axis=0)   # [3C, N]
        lc = jnp.concatenate(lcs, axis=0)
        return self.basis_mat((pc * lc).T)

    def __call__(self, coords: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self.density_feature(coords), self.app_feature(coords)


def upsample_vm_params(params: dict, res_target: int) -> dict:
    """Bilinearly upsample VM factors to ``res_target`` (reference up_sampling_VM,
    tensorf.py:111-126). Operates on the grid's param sub-dict; returns a new dict."""
    def up_plane(p):  # [3, C, R, R]
        return jax.image.resize(p, (*p.shape[:2], res_target, res_target), "bilinear")

    def up_line(l):   # [3, C, R]
        return jax.image.resize(l, (*l.shape[:2], res_target), "linear")

    out = dict(params)
    out["density_plane"] = up_plane(params["density_plane"])
    out["app_plane"] = up_plane(params["app_plane"])
    out["density_line"] = up_line(params["density_line"])
    out["app_line"] = up_line(params["app_line"])
    return out


def resolution_schedule(base: int, maximum: int, num: int):
    """Progressive resolution schedule (reference tensorf.py TensoRF init uses a
    geometric/linear ramp base->max over num steps; trainer steps it at
    epoch % (num_epochs // num_resolutions), pc_nerf/trainer.py:348-355)."""
    import numpy as np
    return [int(round(r)) for r in np.linspace(base, maximum, num)]
