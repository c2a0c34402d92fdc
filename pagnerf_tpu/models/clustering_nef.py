"""Clustering NeF variants.

Equivalents of /root/reference/pc_nerf/clustering_nef.py: NeFs whose instance
embeddings are decoded into discrete instance ids by a clustering model (mean shift)
fitted at validation time. In the torch reference this is a mixin wrapping the forward
pass; here the NeF simply carries a static ``use_clustering`` flag and the trainer
owns the host-side clustering object (utils/clustering.py) — the rendered
``inst_embedding`` channel is clustered outside jit, exactly where the reference also
leaves the GPU (sklearn, clustering_nef.py:43-59).
"""
from __future__ import annotations

from .nefs import PanopticDDensityNeF, PanopticDeltaNeF, PanopticNeF


class MeanShiftPanopticNeF(PanopticNeF):
    use_clustering: bool = True


class MeanShiftPanopticDeltaNeF(PanopticDeltaNeF):
    use_clustering: bool = True


class MeanShiftPanopticDDensityNeF(PanopticDDensityNeF):
    use_clustering: bool = True
