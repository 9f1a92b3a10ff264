"""CLIP text tower parity: our flax CLIPText vs the reference CLIPTEXT
(``DiverGen/divergen/modeling/text/text_encoder.py:17-188``) through
``utils/torch_weights.convert_clip_text``.

Covers the shared ``_convert_resblock`` mapping (in_proj/out_proj layout,
QuickGELU, pre-LN residual blocks) used by both text and vision towers, the
causal mask, and argmax-EOT pooling + projection.
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
import ref_loader  # noqa: E402


def test_clip_text_forward_parity():
    ref_loader.install()
    import torch

    from divergen.modeling.text.text_encoder import CLIPTEXT

    import jax.numpy as jnp

    from divergen_tpu.modeling.text.clip import CLIPText
    from divergen_tpu.utils.torch_weights import convert_clip_text

    torch.manual_seed(1)
    ref = CLIPTEXT(
        embed_dim=48,
        context_length=77,
        vocab_size=600,
        transformer_width=64,
        transformer_heads=4,
        transformer_layers=3,
    )
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_clip_text(sd)

    ours = CLIPText(
        embed_dim=48, context_length=77, vocab_size=600, width=64, heads=4, layers=3
    )

    rng = np.random.RandomState(0)
    # token rows: id 0 padding after a max-id EOT (argmax pooling convention)
    tokens = np.zeros((3, 77), np.int64)
    for i in range(3):
        n = rng.randint(5, 20)
        tokens[i, :n] = rng.randint(1, 599, n)
        tokens[i, n] = 599  # EOT = max id
    with torch.no_grad():
        want = ref.encode_text(torch.from_numpy(tokens)).numpy()

    got = np.asarray(ours.apply(params, jnp.asarray(tokens, jnp.int32)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_clip_text_sequence_parity():
    """return_sequence path (ln_final output) matches the reference's
    pre-pooling hidden states."""
    ref_loader.install()
    import torch

    from divergen.modeling.text.text_encoder import CLIPTEXT

    import jax.numpy as jnp

    from divergen_tpu.modeling.text.clip import CLIPText
    from divergen_tpu.utils.torch_weights import convert_clip_text

    torch.manual_seed(2)
    ref = CLIPTEXT(embed_dim=32, vocab_size=300, transformer_width=32,
                   transformer_heads=2, transformer_layers=2)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_clip_text(sd)
    ours = CLIPText(embed_dim=32, vocab_size=300, width=32, heads=2, layers=2)

    tokens = np.zeros((2, 77), np.int64)
    tokens[:, 0] = 5
    tokens[0, 1:4] = [7, 8, 299]
    tokens[1, 1:3] = [9, 299]

    t = torch.from_numpy(tokens)
    with torch.no_grad():
        x = ref.token_embedding(t) + ref.positional_embedding
        x = ref.transformer(x.permute(1, 0, 2)).permute(1, 0, 2)
        want_seq = ref.ln_final(x).numpy()

    _, got_seq = ours.apply(params, jnp.asarray(tokens, jnp.int32),
                            return_sequence=True)
    np.testing.assert_allclose(np.asarray(got_seq), want_seq, rtol=1e-4, atol=1e-4)
