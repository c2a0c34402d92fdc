"""Dataset format protocol.

Equivalent of /root/reference/datasets/formats/format_base.py: every format module
exposes ``load_data(root, split, ...) -> data dict`` producing the framework's
standard schema (see data/synthetic.py for the canonical field list: imgs, label
modes, rays/base_rays, view matrices, intrinsics, semantic_info, split indices).
"""
from __future__ import annotations

from typing import Dict, Protocol


class DatasetFormat(Protocol):
    def load_data(self, root: str, split: str = "train", **kwargs) -> Dict:
        """Load the dataset from disk into the standard data dict."""
        ...


# format-name registry used by the module factory (config/factory.py load_dataset)
FORMATS = {
    "synthetic": "pagnerf_tpu.data.synthetic",
    "bup20": "pagnerf_tpu.data.formats.bup20",
    "standard": "pagnerf_tpu.data.formats.nerf_standard",
    "nerf_standard": "pagnerf_tpu.data.formats.nerf_standard",
}
