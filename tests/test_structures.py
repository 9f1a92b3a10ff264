"""Structure-semantics tests (pattern: detectron2 tests/structures/)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from divergen_tpu.structures import (
    ImageList,
    Instances,
    boxes as box_ops,
    crop_and_resize,
    empty_instances,
    masks_to_boxes,
)


class TestBoxes:
    def test_area(self):
        b = jnp.array([[0, 0, 10, 10], [5, 5, 5, 20], [3, 3, 1, 1]], jnp.float32)
        np.testing.assert_allclose(box_ops.area(b), [100.0, 0.0, 0.0])

    def test_pairwise_iou_matches_numpy(self, rng):
        def np_iou(b1, b2):
            out = np.zeros((len(b1), len(b2)))
            for i, a in enumerate(b1):
                for j, b in enumerate(b2):
                    ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
                    ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
                    inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
                    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
                    out[i, j] = inter / ua if inter > 0 else 0.0
            return out

        xy = rng.rand(8, 2) * 50
        wh = rng.rand(8, 2) * 30 + 1
        b1 = np.concatenate([xy, xy + wh], -1).astype(np.float32)
        xy = rng.rand(6, 2) * 50
        wh = rng.rand(6, 2) * 30 + 1
        b2 = np.concatenate([xy, xy + wh], -1).astype(np.float32)
        np.testing.assert_allclose(
            box_ops.pairwise_iou(jnp.array(b1), jnp.array(b2)), np_iou(b1, b2), atol=1e-5
        )

    def test_clip_and_nonempty(self):
        b = jnp.array([[-5, -5, 20, 20], [90, 90, 120, 95]], jnp.float32)
        c = box_ops.clip(b, (100, 100))
        np.testing.assert_allclose(c, [[0, 0, 20, 20], [90, 90, 100, 95]])
        assert box_ops.nonempty(c).tolist() == [True, True]

    def test_convert_roundtrip(self, rng):
        b = jnp.array(rng.rand(5, 4).astype(np.float32))
        out = box_ops.xyxy_to_xywh(box_ops.xywh_to_xyxy(b))
        np.testing.assert_allclose(out, b, atol=1e-6)


class TestInstances:
    def test_fields_and_pytree(self):
        ins = empty_instances((64, 64), 10)
        ins.boxes = ins.boxes.at[0].set(jnp.array([1.0, 2, 3, 4]))
        ins = ins.set("valid", ins.valid.at[0].set(True))
        assert ins.has("boxes") and not ins.has("masks")
        assert len(ins) == 10
        assert int(ins.num_valid()) == 1
        leaves, treedef = jax.tree_util.tree_flatten(ins)
        rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
        assert rebuilt.image_size == (64, 64)
        np.testing.assert_allclose(rebuilt.boxes, ins.boxes)

    def test_jit_through(self):
        ins = empty_instances((32, 32), 4)

        @jax.jit
        def f(x: Instances):
            return x.set("scores", x.scores + 1.0)

        out = f(ins)
        np.testing.assert_allclose(out.scores, np.ones(4))

    def test_cat_and_pad(self):
        a = empty_instances((32, 32), 3)
        b = empty_instances((32, 32), 5)
        c = Instances.cat([a, b])
        assert len(c) == 8
        assert len(c.pad_to(12)) == 12
        assert len(c.pad_to(4)) == 4

    def test_masked_filter(self):
        ins = empty_instances((32, 32), 4)
        ins = ins.set("valid", jnp.array([True, True, True, False]))
        out = ins.masked(jnp.array([True, False, True, True]))
        assert out.valid.tolist() == [True, False, True, False]


class TestMasks:
    def test_masks_to_boxes(self):
        m = np.zeros((2, 20, 20), np.float32)
        m[0, 3:8, 4:10] = 1
        out = masks_to_boxes(jnp.array(m))
        np.testing.assert_allclose(out[0], [4, 3, 10, 8])
        np.testing.assert_allclose(out[1], [0, 0, 0, 0])

    def test_crop_and_resize_identity(self):
        m = np.zeros((1, 16, 16), np.float32)
        m[0, 4:12, 4:12] = 1
        out = crop_and_resize(jnp.array(m), jnp.array([[4.0, 4, 12, 12]]), 8)
        # interior of the crop is fully on
        assert float(out[0, 2:6, 2:6].min()) > 0.99


class TestImageList:
    def test_padding_mask(self):
        t = jnp.zeros((2, 8, 8, 3))
        il = ImageList(tensor=t, image_sizes=jnp.array([[8, 8], [4, 6]]))
        pm = il.padding_mask()
        assert bool(pm[0].all())
        assert float(pm[1].sum()) == 4 * 6

    def test_divisibility(self):
        t = jnp.zeros((1, 30, 33, 3))
        il = ImageList.from_tensors(t, jnp.array([[30, 33]]), size_divisibility=32)
        assert il.tensor.shape == (1, 32, 64, 3)
