"""SAM model + corner-mask CLI tests."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from divergen_tpu.pipeline.segmentation.sam import SAM, upscale_masks
from divergen_tpu.pipeline.segmentation.corner_masks import corner_points, main


def test_sam_tiny_shapes():
    sam = SAM.tiny(img_size=64)
    imgs = jnp.zeros((1, 64, 64, 3))
    pts = jnp.asarray(corner_points(64, 10))[None]
    lbl = jnp.ones((1, 4), jnp.int32)
    params = sam.init(jax.random.PRNGKey(0), imgs, pts, lbl)
    masks, iou = sam.apply(params, imgs, pts, lbl)
    assert masks.shape == (1, 3, 16, 16)
    assert iou.shape == (1, 3)
    assert upscale_masks(masks, 64).shape == (1, 3, 64, 64)


def test_corner_points():
    pts = corner_points(100, 7)
    np.testing.assert_array_equal(pts, [[7, 7], [93, 7], [7, 93], [93, 93]])


@pytest.mark.slow
def test_corner_mask_cli(tmp_path):
    import cv2

    in_dir = tmp_path / "gen"
    (in_dir / "catA").mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(3):
        cv2.imwrite(str(in_dir / "catA" / f"7_{i:07d}.png"),
                    rng.randint(0, 255, (96, 96, 3), np.uint8))
    out_dir = tmp_path / "masks"
    rc = main([
        "--in_dir", str(in_dir), "--out_dir", str(out_dir),
        "--img_size", "64", "--batch", "2", "--tiny",
    ])
    assert rc == 0
    outs = sorted(os.listdir(out_dir / "catA"))
    assert outs == [f"7_{i:07d}.png" for i in range(3)]
    m = cv2.imread(str(out_dir / "catA" / outs[0]), cv2.IMREAD_GRAYSCALE)
    assert m.shape == (96, 96)
    assert set(np.unique(m)) <= {0, 255}
    # resume: second run skips everything
    t0 = {f: os.path.getmtime(out_dir / "catA" / f) for f in outs}
    main(["--in_dir", str(in_dir), "--out_dir", str(out_dir),
          "--img_size", "64", "--batch", "2", "--tiny", "--disable_overwrite"])
    for f in outs:
        assert os.path.getmtime(out_dir / "catA" / f) == t0[f]
