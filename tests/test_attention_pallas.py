"""Fused Pallas attention vs. the XLA reference attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perceive_tpu.models.encoder import _xla_attention
from perceive_tpu.ops.attention import fused_attention


@pytest.mark.parametrize("b,s,nh,dh", [(2, 16, 4, 32), (1, 48, 2, 64), (3, 32, 12, 32)])
def test_matches_xla_attention(b, s, nh, dh):
    rng = np.random.default_rng(b * 1000 + s)
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, s, nh, dh)).astype(np.float32)) for _ in range(3)
    )
    lens = rng.integers(1, s + 1, b)
    mask = jnp.asarray((np.arange(s)[None, :] < lens[:, None]).astype(np.int32))

    got = fused_attention(q, k, v, mask)
    bias = (1.0 - mask[:, None, None, :].astype(jnp.float32)) * -1e9
    want = _xla_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_encoder_pallas_impl_end_to_end():
    """Full encoder forward with attention_impl='pallas' matches 'xla'."""
    from perceive_tpu.models.encoder import EncoderArch, HeadConfig, encode_tokens, init_params

    arch = EncoderArch(
        vocab_size=128, hidden_size=64, num_layers=2, num_heads=4,
        intermediate_size=128, max_position_embeddings=64,
    )
    head = HeadConfig(normalize=True)
    params = init_params(jax.random.PRNGKey(0), arch, head)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 128, (4, 32)).astype(np.int32))
    lens = np.array([32, 20, 7, 1])
    mask = jnp.asarray((np.arange(32)[None, :] < lens[:, None]).astype(np.int32))
    types = jnp.zeros_like(ids)

    out_x = encode_tokens(params, arch, head, ids, mask, types, compute_dtype=jnp.float32, attention_impl="xla")
    out_p = encode_tokens(params, arch, head, ids, mask, types, compute_dtype=jnp.float32, attention_impl="pallas")
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), rtol=1e-4, atol=1e-5)


def test_tpu_impl_routes_by_sequence_bucket(monkeypatch):
    """attention_impl='tpu' picks XLA attention below _PALLAS_MIN_SEQ and
    the Pallas kernel at/above it (measured crossover, probe_embed2):
    a blanket 'pallas' cost the seq-128 ingest bucket 1.76x."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from perceive_tpu.models.encoder import _PALLAS_MIN_SEQ, _attention
    from perceive_tpu.ops import attention as attn_mod

    calls = []
    real = attn_mod.fused_attention

    def spy(q, k, v, mask, *, interpret=None):
        calls.append(q.shape[1])
        return real(q, k, v, mask, interpret=True)

    monkeypatch.setattr(attn_mod, "fused_attention", spy)
    rng = np.random.default_rng(0)

    def run(s):
        q = jnp.asarray(rng.standard_normal((2, s, 2, 8)).astype(np.float32))
        mask = jnp.ones((2, s), jnp.int32)
        return _attention(q, q, q, mask, "tpu")

    short = max(s for s in (16, 64, 128, 256) if s < _PALLAS_MIN_SEQ)
    run(short)
    assert calls == []  # short bucket: XLA path, kernel never invoked
    run(_PALLAS_MIN_SEQ)
    assert calls == [_PALLAS_MIN_SEQ]  # long bucket: the Pallas kernel
