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


def _bilinear_plane(plane: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """plane [C, R, R], u/v [N] in [-1, 1] (align_corners=True) -> [C, N].

    Feature-major lookups: row gathers along a flattened [C, R*R] view keep the
    sample axis on lanes (see ops/permuto_encoding.py layout note). The reference
    uses grid_sample with (x, y) = (first coord -> width, second -> height), i.e.
    plane indexed [C, y, x]."""
    r = plane.shape[-1]
    gu = (u + 1.0) * 0.5 * (r - 1)
    gv = (v + 1.0) * 0.5 * (r - 1)
    x0 = jnp.clip(jnp.floor(gu).astype(jnp.int32), 0, r - 2)
    y0 = jnp.clip(jnp.floor(gv).astype(jnp.int32), 0, r - 2)
    fx, fy = gu - x0, gv - y0
    flat = plane.reshape(plane.shape[0], -1)                    # [C, R*R]

    def tap(dy, dx):
        return jnp.take(flat, (y0 + dy) * r + (x0 + dx), axis=1)  # [C, N]

    return (tap(0, 0) * (1 - fx) * (1 - fy) + tap(0, 1) * fx * (1 - fy)
            + tap(1, 0) * (1 - fx) * fy + tap(1, 1) * fx * fy)


def _linear_line(line: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """line [C, R], w [N] in [-1, 1] (align_corners=True) -> [C, N]."""
    r = line.shape[-1]
    g = (w + 1.0) * 0.5 * (r - 1)
    g0 = jnp.clip(jnp.floor(g).astype(jnp.int32), 0, r - 2)
    f = g - g0
    return jnp.take(line, g0, axis=1) * (1 - f) + jnp.take(line, g0 + 1, axis=1) * f


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
        from .decoder import DenseT
        self.basis_mat = DenseT(self.app_dim, use_bias=False, name="basis_mat")

    def density_feature(self, coordsT: jnp.ndarray) -> jnp.ndarray:
        """[3, N] -> [N] sigma feature (reference compute_densityfeature,
        tensorf.py:73-88)."""
        sigma = jnp.zeros(coordsT.shape[1], coordsT.dtype)
        for i in range(3):
            a, b = _MAT_MODE[i]
            pc = _bilinear_plane(self.density_plane[i], coordsT[a], coordsT[b])
            lc = _linear_line(self.density_line[i], coordsT[_VEC_MODE[i]])
            sigma = sigma + jnp.sum(pc * lc, axis=0)
        return sigma

    def app_feature(self, coordsT: jnp.ndarray) -> jnp.ndarray:
        """[3, N] -> [app_dim, N] (reference compute_appfeature, tensorf.py:91-106)."""
        pcs, lcs = [], []
        for i in range(3):
            a, b = _MAT_MODE[i]
            pcs.append(_bilinear_plane(self.app_plane[i], coordsT[a], coordsT[b]))
            lcs.append(_linear_line(self.app_line[i], coordsT[_VEC_MODE[i]]))
        pc = jnp.concatenate(pcs, axis=0)   # [3C, N]
        lc = jnp.concatenate(lcs, axis=0)
        return self.basis_mat(pc * lc)      # [app_dim, N]

    def __call__(self, coordsT: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self.density_feature(coordsT), self.app_feature(coordsT)


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
