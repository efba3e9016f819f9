"""Constants parity checks against values pinned from the reference
(lib/pafprocess/pafprocess.h, lib/datasets/datasets.py, eval.py)."""

import numpy as np

from torch_ekpose_tpu import constants as C


def test_pair_tables_consistent():
    assert len(C.COCO_PAIRS) == 19
    assert len(C.COCO_PAIRS_NET) == 19
    assert len(C.LIMB_IDS) == 19
    # Every PAF channel pair is (2k, 2k+1) for a unique k.
    xs = [a for a, b in C.COCO_PAIRS_NET]
    assert sorted(xs) == list(range(0, 38, 2))
    for a, b in C.COCO_PAIRS_NET:
        assert b == a + 1


def test_decode_channels_match_training_limbs():
    # For each decoder pair, the PAF channel pair k = COCO_PAIRS_NET[i][0]//2
    # was rasterized for training limb LIMB_IDS[k]. All pairs agree except
    # the two inherited shoulder->ear / shoulder->eye mismatches.
    mismatches = []
    for i, (pair, net) in enumerate(zip(C.COCO_PAIRS, C.COCO_PAIRS_NET)):
        train_limb = C.LIMB_IDS[net[0] // 2]
        if tuple(train_limb) != tuple(pair):
            mismatches.append((tuple(pair), tuple(train_limb)))
    assert mismatches == [((2, 16), (2, 14)), ((5, 17), (5, 15))]


def test_our_order_round_trip():
    # internal -> COCO via ORDER_COCO must invert COCO -> internal via
    # OUR_ORDER for the 17 real COCO keypoints.
    for coco_idx in range(17):
        internal_idx = C.OUR_ORDER.index(coco_idx)
        assert C.ORDER_COCO[coco_idx] == internal_idx


def test_add_neck_midpoint_and_visibility():
    kpts = np.zeros((17, 3))
    kpts[5] = [10.0, 20.0, 2]   # left_shoulder
    kpts[6] = [30.0, 40.0, 2]   # right_shoulder
    out = C.coco_to_internal_keypoints(kpts)
    assert out.shape == (18, 3)
    np.testing.assert_allclose(out[C.CocoPart.Neck], [20.0, 30.0, 2.0])
    # one shoulder not visible -> neck visibility = product
    kpts[6, 2] = 1
    out = C.coco_to_internal_keypoints(kpts)
    assert out[C.CocoPart.Neck, 2] == 2.0  # round(2*1/... ) -> product = 2*1=2
    kpts[6, 2] = 0
    out = C.coco_to_internal_keypoints(kpts)
    assert out[C.CocoPart.Neck, 2] == 0.0


def test_hflip_swap_is_involution():
    swap = list(C.HFLIP_COCO_SWAP)
    for i, j in enumerate(swap):
        assert swap[j] == i
    # nose maps to itself
    assert swap[0] == 0
    # left_eye (1) <-> right_eye (2)
    assert swap[1] == 2 and swap[2] == 1


def test_internal_to_coco_round_trip():
    internal = np.arange(18 * 3, dtype=float).reshape(18, 3)
    coco = C.internal_to_coco_keypoints(internal)
    assert coco.shape == (17, 3)
    for coco_idx in range(17):
        np.testing.assert_array_equal(coco[coco_idx], internal[C.ORDER_COCO[coco_idx]])


def test_config_namespaces():
    from torch_ekpose_tpu.config import cfg, Config

    assert cfg.MODEL.NUM_KEYPOINTS == 18
    assert cfg.MODEL.DOWNSAMPLE == 8
    assert cfg.TEST.THRESH_HEATMAP == 0.15
    assert cfg.TEST.THRESH_PAF == 0.05
    assert cfg.TEST.NUM_INTERMED_PTS_BETWEEN_KEYPOINTS == 10
    d = cfg.to_dict()
    assert Config.from_dict(d).to_dict() == d
