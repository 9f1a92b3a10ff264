"""R50 backbone conversion parity vs the real detectron2 ResNet.

BSGAL's published checkpoints are R50+FrozenBN (BSGAL_R50.yaml); this pins
``_convert_d2_resnet`` (conv layout + FrozenBN running-stat folding +
stride_in_1x1 bottlenecks) against the reference module's forward on all
four output stages."""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
import ref_loader  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _install():
    ref_loader.install()


def test_resnet50_conversion_forward_parity():
    import torch

    import jax.numpy as jnp

    from detectron2.modeling.backbone.resnet import BasicStem, ResNet as RefResNet
    from divergen_tpu.modeling.backbone.resnet import ResNet
    from divergen_tpu.utils.torch_weights import convert_d2_detector

    torch.manual_seed(7)
    ref = RefResNet(
        BasicStem(norm="FrozenBN"),
        RefResNet.make_default_stages(50, norm="FrozenBN", stride_in_1x1=True),
        out_features=["res2", "res3", "res4", "res5"],
    ).eval()
    # give the frozen stats non-trivial values so the folding is exercised
    with torch.no_grad():
        for name, buf in ref.named_buffers():
            if "running_mean" in name:
                buf.normal_(0.0, 0.1)
            elif "running_var" in name:
                buf.uniform_(0.5, 2.0)

    sd = {f"backbone.bottom_up.{k}": v.detach().numpy()
          for k, v in ref.state_dict().items()}
    conv = convert_d2_detector(sd, fpn_in_features=())
    assert not conv["_stats"]["unmapped"], conv["_stats"]["unmapped"][:5]

    ours = ResNet(depth=50, norm="FrozenBN",
                  out_features=("res2", "res3", "res4", "res5"))
    rng = np.random.RandomState(8)
    x = rng.randn(1, 64, 64, 3).astype(np.float32)
    feats = ours.apply({"params": conv["bottom_up"]}, jnp.asarray(x))
    with torch.no_grad():
        ref_feats = ref(torch.tensor(x.transpose(0, 3, 1, 2)))
    for name in ("res2", "res3", "res4", "res5"):
        np.testing.assert_allclose(
            np.asarray(feats[name]),
            ref_feats[name].numpy().transpose(0, 2, 3, 1),
            rtol=5e-3, atol=5e-3, err_msg=name,
        )
