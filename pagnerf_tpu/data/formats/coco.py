"""Minimal COCO annotation reader + mask rasteriser.

Replaces the reference's pycocotools dependency
(/root/reference/datasets/formats/agrobot_base.py:17-18,57-62) with a dependency-free
implementation: JSON parsing, per-image annotation lookup, and segmentation
rasterisation for both polygon and (un)compressed RLE formats."""
from __future__ import annotations

import json
from typing import Dict, List

import numpy as np


def _decode_compressed_rle(counts: bytes, h: int, w: int) -> np.ndarray:
    """COCO compressed RLE (LEB128-style) -> [h, w] mask."""
    if isinstance(counts, str):
        counts = counts.encode("ascii")
    cnts: List[int] = []
    i = 0
    while i < len(counts):
        x, k, more = 0, 0, True
        while more:
            c = counts[i] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(cnts) > 2:
            x += cnts[-2]
        cnts.append(x)
    return _runs_to_mask(cnts, h, w)


def _runs_to_mask(runs: List[int], h: int, w: int) -> np.ndarray:
    flat = np.zeros(h * w, np.uint8)
    pos, val = 0, 0
    for run in runs:
        if val:
            flat[pos:pos + run] = 1
        pos += run
        val ^= 1
    # COCO RLE is column-major
    return flat.reshape(w, h).T


def _polygons_to_mask(polys, h: int, w: int) -> np.ndarray:
    from PIL import Image, ImageDraw
    img = Image.new("L", (w, h), 0)
    draw = ImageDraw.Draw(img)
    for poly in polys:
        pts = [(poly[i], poly[i + 1]) for i in range(0, len(poly) - 1, 2)]
        if len(pts) >= 3:
            draw.polygon(pts, outline=1, fill=1)
    return np.asarray(img, np.uint8)


def ann_to_mask(ann: Dict, h: int, w: int) -> np.ndarray:
    """pycocotools ``annToMask`` equivalent."""
    seg = ann.get("segmentation")
    if seg is None:
        return np.zeros((h, w), np.uint8)
    if isinstance(seg, list):
        return _polygons_to_mask(seg, h, w)
    counts = seg["counts"]
    sh, sw = seg.get("size", (h, w))
    if isinstance(counts, list):
        return _runs_to_mask(counts, sh, sw)
    return _decode_compressed_rle(counts, sh, sw)


class COCO:
    """Subset of the pycocotools COCO API used by the sequence loader."""

    def __init__(self, annotation_file):
        with open(annotation_file) as f:
            self.dataset = json.load(f)
        self.imgs = {im["id"]: im for im in self.dataset.get("images", [])}
        self.cats = {c["id"]: c for c in self.dataset.get("categories", [])}
        self.img_to_anns: Dict[int, List[Dict]] = {}
        for ann in self.dataset.get("annotations", []):
            self.img_to_anns.setdefault(ann["image_id"], []).append(ann)

    def getImgIds(self):
        return list(self.imgs.keys())

    def loadImgs(self, ids):
        if isinstance(ids, (int, np.integer)):
            ids = [ids]
        return [self.imgs[i] for i in ids]

    def getAnnIds(self, imgIds, catIds=None, iscrowd=None):
        if isinstance(imgIds, (int, np.integer)):
            imgIds = [imgIds]
        anns = [a for i in imgIds for a in self.img_to_anns.get(i, [])]
        if catIds:
            anns = [a for a in anns if a["category_id"] in set(catIds)]
        return [a["id"] for a in anns]

    def loadAnns(self, ids):
        ids = set(ids)
        return [a for anns in self.img_to_anns.values() for a in anns
                if a["id"] in ids]

    def annToMask(self, ann) -> np.ndarray:
        img = self.imgs[ann["image_id"]]
        return ann_to_mask(ann, img["height"], img["width"])
