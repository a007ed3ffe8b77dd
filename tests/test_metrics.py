"""Metric tests vs hand-computed confusion matrices (SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp

from mmr_tpu.metrics import (
    Evaluate,
    segmentation_stats,
    iou_score,
    f1_score,
    precision,
    recall,
    binary_dice,
    hausdorff_distance,
)
from mmr_tpu.metrics.hausdorff import capped_hausdorff
from mmr_tpu.ops.pallas.confusion import confusion_stats, confusion_stats_xla


def test_pallas_confusion_matches_xla_oracle(rng):
    p = rng.randint(0, 7, size=(2, 57, 91))
    g = rng.randint(0, 7, size=(2, 57, 91))
    tp1, fp1, fn1 = confusion_stats(jnp.asarray(p), jnp.asarray(g), 7, interpret=True)
    tp2, fp2, fn2 = confusion_stats_xla(jnp.asarray(p), jnp.asarray(g), 7)
    np.testing.assert_array_equal(np.asarray(tp1), np.asarray(tp2))
    np.testing.assert_array_equal(np.asarray(fp1), np.asarray(fp2))
    np.testing.assert_array_equal(np.asarray(fn1), np.asarray(fn2))


def test_evaluate_hand_computed():
    # 1 image, 2 classes: pred = [[0,0],[1,1]], gt = [[0,1],[1,1]]
    pred = np.array([[[0, 0], [1, 1]]])
    gt = np.array([[[0, 1], [1, 1]]])
    ev = Evaluate(2)
    ev.add_batch(jnp.asarray(pred), jnp.asarray(gt))
    # class0: tp=1 fp=1 fn=0 → iou=1/2 ; class1: tp=2 fp=0 fn=1 → iou=2/3
    per_class, mean = ev.iou()
    np.testing.assert_allclose(per_class, [0.5, 2 / 3], rtol=1e-9)
    np.testing.assert_allclose(mean, (0.5 + 2 / 3) / 2, rtol=1e-9)
    p, r, f1 = ev.precision_recall_f1()
    np.testing.assert_allclose(p, [0.5, 1.0], rtol=1e-9)
    np.testing.assert_allclose(r, [1.0, 2 / 3], rtol=1e-9)


def test_evaluate_accepts_logits(rng):
    gt = rng.randint(0, 3, size=(2, 8, 8))
    logits = np.eye(3, dtype=np.float32)[gt]
    ev = Evaluate(3)
    ev.add_batch(jnp.asarray(logits), jnp.asarray(gt))
    per_class, mean = ev.iou()
    np.testing.assert_allclose(mean, 1.0, rtol=1e-9)


def test_segmentation_stats_ignore_index():
    # preds-1 / masks-1 / ignore_index=-1 background-drop trick
    # (Main_MMR_SegModel.py:1323-1326)
    pred = np.array([[[1, 2], [0, 2]]]) - 1
    gt = np.array([[[1, 2], [0, 0]]]) - 1
    tp, fp, fn, tn = segmentation_stats(jnp.asarray(pred), jnp.asarray(gt), 2, ignore_index=-1)
    # valid pixels: gt>=0 → positions (0,0)=cls0 and (0,1)=cls1
    np.testing.assert_array_equal(np.asarray(tp[0]), [1.0, 1.0])
    np.testing.assert_array_equal(np.asarray(fp[0]), [0.0, 0.0])
    np.testing.assert_array_equal(np.asarray(fn[0]), [0.0, 0.0])


def test_iou_reductions():
    tp = jnp.asarray([[2.0, 0.0]])
    fp = jnp.asarray([[1.0, 0.0]])
    fn = jnp.asarray([[1.0, 0.0]])
    tn = jnp.asarray([[0.0, 4.0]])
    none = np.asarray(iou_score(tp, fp, fn, tn))
    np.testing.assert_allclose(none, [[0.5, 1.0]])  # zero_division=1.0 (smp default)
    np.testing.assert_allclose(float(iou_score(tp, fp, fn, tn, reduction="macro")), 0.75)
    np.testing.assert_allclose(float(f1_score(tp, fp, fn, tn, reduction="macro")), (2 / 3 + 1) / 2)
    np.testing.assert_allclose(np.asarray(precision(tp, fp, fn, tn))[0], [2 / 3, 1.0])
    np.testing.assert_allclose(np.asarray(recall(tp, fp, fn, tn))[0], [2 / 3, 1.0])


def test_binary_dice():
    m1 = np.array([[1, 1, 0], [0, 1, 0]])
    m2 = np.array([[1, 0, 0], [0, 1, 1]])
    np.testing.assert_allclose(binary_dice(m1, m2), 2 * 2 / (3 + 3))
    assert binary_dice(np.zeros((4, 4)), np.zeros((4, 4))) == 1.0


def test_hausdorff():
    a = np.zeros((10, 10)); a[2, 2] = 1
    b = np.zeros((10, 10)); b[2, 5] = 1
    np.testing.assert_allclose(hausdorff_distance(a, b), 3.0)
    assert capped_hausdorff(a, np.zeros((10, 10))) == 1000.0  # ∞→1000 cap
    assert hausdorff_distance(np.zeros((4, 4)), np.zeros((4, 4))) == 0.0
    # symmetric: max of directed distances
    c = np.zeros((10, 10)); c[2, 2] = 1; c[9, 9] = 1
    d = np.zeros((10, 10)); d[2, 2] = 1
    np.testing.assert_allclose(hausdorff_distance(c, d), np.hypot(7, 7))
