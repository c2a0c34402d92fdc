"""Class taxonomies: stuff/things partitions and cross-dataset id mapping.

Equivalent of /root/reference/datasets/formats/categories.py, which holds Replica
stuff/things class-name lists and an ADE20K->Replica id map for the (lazily imported,
absent-from-repo) replica loader. Here the taxonomy is expressed as data + helpers so
any dataset format can declare its partition; the BUP20/SB20 agricultural taxonomies
(the ones the shipped loaders actually use) are first-class.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

# --------------------------------------------------------------------------- BUP20
BUP20_CLASS_NAMES = ["bg", "pepper"]
BUP20_STUFF = ["bg"]
BUP20_THINGS = ["pepper"]

# ---------------------------------------------------------------------------- SB20
SB20_CLASS_NAMES = ["bg", "sugar_beet", "weed"]
SB20_STUFF = ["bg"]
SB20_THINGS = ["sugar_beet", "weed"]

# -------------------------------------------------------------------------- Replica
# Standard Replica semantic taxonomy partition (subset of classes that occur in the
# released scenes). Stuff = architectural/background surfaces; things = countable
# objects (the partition the panoptic metrics consume).
REPLICA_STUFF_NAMES = [
    "undefined", "wall", "floor", "ceiling", "door", "window", "stair",
    "blinds", "curtain", "pillar", "wall-plug", "panel", "vent", "pipe", "beam",
]
REPLICA_THINGS_NAMES = [
    "basket", "bed", "bench", "bike", "bin", "blanket", "book", "bottle", "bowl",
    "box", "cabinet", "camera", "candle", "chair", "clock", "cloth", "comforter",
    "cushion", "desk", "desk-organizer", "indoor-plant", "lamp", "monitor",
    "nightstand", "picture", "pillow", "plant-stand", "plate", "pot", "rack",
    "refrigerator", "rug", "sculpture", "shelf", "shoe", "sofa", "stool", "switch",
    "table", "tablet", "tissue-paper", "tv-screen", "tv-stand", "vase",
    "wall-cabinet",
]
REPLICA_CLASS_NAMES = REPLICA_STUFF_NAMES + REPLICA_THINGS_NAMES


def class_partition(class_names: Sequence[str], stuff_names: Sequence[str]) -> Dict:
    """Build the semantic_info partition dict from name lists (the structure every
    format's ``get_semantic_info`` returns, e.g. bup20.py get_semantic_info)."""
    stuff = set(stuff_names)
    ids = list(range(len(class_names)))
    return {
        "class_id_to_name": dict(enumerate(class_names)),
        "num_classes": len(class_names),
        "classes_present": ids,
        "num_present_classes": len(ids),
        "stuff_ids": [i for i, n in enumerate(class_names) if n in stuff],
        "things_ids": [i for i, n in enumerate(class_names) if n not in stuff],
    }


def name_id_map(src_names: Sequence[str], dst_names: Sequence[str],
                aliases: Dict[str, str] | None = None,
                default: int = 0) -> List[int]:
    """Cross-taxonomy id map by name matching (the role of the reference's
    AD20K_to_replica_class_ids table): src class id -> dst class id; unmatched
    classes map to ``default`` (background)."""
    aliases = aliases or {}
    dst_index = {n: i for i, n in enumerate(dst_names)}
    out = []
    for name in src_names:
        name = aliases.get(name, name)
        out.append(dst_index.get(name, default))
    return out


# A few common ADE20K->Replica name aliases (extend per experiment).
ADE20K_TO_REPLICA_ALIASES = {
    "plant": "indoor-plant",
    "television receiver": "tv-screen",
    "painting": "picture",
    "armchair": "chair",
    "coffee table": "table",
    "wardrobe": "wall-cabinet",
}
