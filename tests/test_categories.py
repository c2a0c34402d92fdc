"""Taxonomy tables: Replica/ADE20K partitions and the ADE20K->Replica remap
(reference datasets/formats/categories.py; the full tables were golden-compared
against the reference's effective — duplicate-keys-last-wins — semantics when
authored)."""
import numpy as np

from pagnerf_tpu.data.formats import categories as cat


def test_replica_table_shape():
    assert len(cat.REPLICA_ID_TO_NAME) == 102
    assert cat.REPLICA_ID_TO_NAME[0] == "no_class"
    assert cat.REPLICA_ID_TO_NAME[44] == "indoor-plant"
    assert cat.REPLICA_ID_TO_NAME[101] == "set-of-clothing"
    # stuff/things id partitions are disjoint and inside the id range
    assert not set(cat.REPLICA_STUFF_IDS) & set(cat.REPLICA_THINGS_IDS)
    assert all(0 <= i < 102 for i in cat.REPLICA_STUFF_IDS + cat.REPLICA_THINGS_IDS)
    assert len(cat.REPLICA_STUFF_NAMES) == 44
    assert len(cat.REPLICA_THINGS_NAMES) == 62


def test_ade20k_table_shape():
    assert len(cat.ADE20K_CATEGORIES) == 150
    assert cat.ADE20K_CLASS_NAMES[0] == "wall"
    assert cat.ADE20K_CLASS_NAMES[149] == "flag"
    assert len(cat.ADE20K_THINGS_IDS) + len(cat.ADE20K_STUFF_IDS) == 150
    assert cat.ADE20K_COLORS.shape == (150, 3)
    assert 12 in cat.ADE20K_THINGS_IDS      # person
    assert 2 in cat.ADE20K_STUFF_IDS        # sky


def test_ade20k_to_replica_effective_map():
    # duplicate source keys resolve last-wins, matching the reference dict literal
    m = cat.ADE20K_TO_REPLICA_IDS
    assert m[10] == cat.REPLICA_NAME_TO_ID["wall-cabinet"]   # cabinet: last of 4
    assert m[65] == cat.REPLICA_NAME_TO_ID["toilet"]
    assert m[50] == cat.REPLICA_NAME_TO_ID["refrigerator"]
    assert m[115] == cat.REPLICA_NAME_TO_ID["bag"]
    assert m[0] == cat.REPLICA_NAME_TO_ID["wall"]
    assert m[1] == 0                                         # building: unmapped


def test_ade20k_to_replica_remap_fn():
    sem = np.array([[0, 1, -1], [65, 149, 200]])
    out = cat.ade20k_to_replica(sem)
    assert out.dtype == np.int32
    assert out[0, 0] == cat.REPLICA_NAME_TO_ID["wall"]
    assert out[0, 1] == 0 and out[0, 2] == 0 and out[1, 2] == 0
    assert out[1, 0] == cat.REPLICA_NAME_TO_ID["toilet"]


def test_partition_helper():
    info = cat.class_partition(cat.BUP20_CLASS_NAMES, cat.BUP20_STUFF)
    assert info["num_classes"] == 2
    assert info["stuff_ids"] == [0] and info["things_ids"] == [1]
