"""Probe: where is the embed throughput headroom?

bench.py measures 11.5-12.6k docs/s (batch 256 x seq 128, bf16,
Pallas fused attention).  Roofline arithmetic says ~34% MXU: ~2.9
GFLOP/doc against ~98 bf16 TFLOPS is ~27k docs/s ideal, so there may
be 2-3x on the table.  Candidates, all compiled first and measured
A/B-interleaved with the in-jit repeat marginal (the abmarginal method,
inlined here because each case has its own batch size):

  prod_b256     production path: pallas attention, lax.scan tower
  xla_b256      XLA einsum+softmax attention (at seq 128 the score
                matrix is 128x128 — flash-style tiling may pay more in
                plumbing than it saves in HBM)
  unroll_b256   python-unrolled layers (no scan): XLA sees the whole
                6-layer graph, can fuse across layer boundaries and
                hoist the stacked-param slicing
  prod_b512 / prod_b1024   batch scaling: if docs/s keeps climbing,
                the ingest pipeline's EMBED_BATCH is leaving MXU idle

Results are docs/s medians; see the `# RESULT` comment at the bottom
after a hardware run.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from perceive_tpu.models import EncoderArch, HeadConfig
from perceive_tpu.models import encoder as enc

SEQ = 128
R = 4
ROUNDS = 8

ARCH = EncoderArch(
    vocab_size=30522, hidden_size=384, num_layers=6, num_heads=12,
    intermediate_size=1536, max_position_embeddings=512,
)
HEAD = HeadConfig(pooling="mean", normalize=True)


def _unrolled_encode(params, input_ids, attention_mask, compute_dtype, attention_impl):
    """The production tower with the lax.scan replaced by a python loop
    (same _encoder_layer, same embedding prologue semantics)."""
    arch = ARCH
    embed = params["embed"]
    x = embed["word"][input_ids]
    pos = jnp.arange(input_ids.shape[1])[None, :]
    x = x + embed["position"][pos]
    tt = jnp.zeros_like(input_ids)
    x = x + embed["token_type"][tt]
    x = enc._layer_norm(x, embed["ln_scale"], embed["ln_bias"], arch.layer_norm_eps)
    x = x.astype(compute_dtype)
    mask = attention_mask.astype(compute_dtype)
    layers = params["layers"]
    for i in range(arch.num_layers):
        lp = jax.tree.map(lambda a: a[i], layers)
        x = enc._encoder_layer(x, lp, mask, arch, attention_impl)
    emb = enc.pool(x, attention_mask, HEAD.pooling)
    return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)


def main():
    on_tpu = jax.default_backend() == "tpu"
    impl_prod = "pallas" if on_tpu else "xla"
    params = enc.init_params(jax.random.PRNGKey(0), ARCH, HEAD)

    def ids(seed, reps, batch):
        k = jax.random.PRNGKey(seed)
        i = jax.random.randint(k, (reps, batch, SEQ), 0, ARCH.vocab_size, jnp.int32)
        m = jnp.ones((reps, batch, SEQ), jnp.int32)
        return jax.block_until_ready(i), m

    def make(reps, batch, impl, unrolled=False):
        def f(p, i, m):
            def it(j, acc):
                if unrolled:
                    e = _unrolled_encode(p, i[j], m[j], jnp.bfloat16, impl)
                else:
                    e = enc.encode_tokens(
                        p, ARCH, HEAD, i[j], m[j],
                        compute_dtype=jnp.bfloat16, attention_impl=impl,
                    )
                return acc + jnp.sum(e)
            return jax.lax.fori_loop(0, reps, it, 0.0)
        return jax.jit(f)

    cases = {
        "prod_b256": (256, impl_prod, False),
        "xla_b256": (256, "xla", False),
        "unroll_b256": (256, impl_prod, True),
        "prod_b512": (512, impl_prod, False),
        "prod_b1024": (1024, impl_prod, False),
    }
    fns = {}
    for name, (batch, impl, unrolled) in cases.items():
        try:
            f1, fR = make(1, batch, impl, unrolled), make(R, batch, impl, unrolled)
            np.asarray(f1(params, *ids(1, 1, batch)))
            np.asarray(fR(params, *ids(1, R, batch)))
            fns[name] = (f1, fR, batch)
        except Exception as e:  # noqa: BLE001
            print(f"# case {name} unavailable ({e})", flush=True)
    marg = {name: [] for name in fns}
    for rnd in range(ROUNDS):
        for name, (f1, fR, batch) in fns.items():
            i1, m1 = ids(1000 + 31 * rnd, 1, batch)
            t0 = time.perf_counter()
            np.asarray(f1(params, i1, m1))
            w1 = time.perf_counter() - t0
            iR, mR = ids(5000 + 31 * rnd, R, batch)
            t0 = time.perf_counter()
            np.asarray(fR(params, iR, mR))
            wR = time.perf_counter() - t0
            marg[name].append(max((wR - w1) / (R - 1), 1e-9))
    for name, s in marg.items():
        arr = np.array(s)
        batch = fns[name][2]
        med = np.median(arr)
        print(
            f"{name:12s} p50 {med * 1e3:8.3f} ms  "
            f"IQR [{np.percentile(arr, 25) * 1e3:8.3f}, {np.percentile(arr, 75) * 1e3:8.3f}]  "
            f"docs/s {batch / med:9.1f}",
            flush=True,
        )


if __name__ == "__main__":
    main()


# RESULT (1x v5e-class chip via tunnel, 2026-08-19, interleaved):
#   prod_b256   (pallas attn)  22.282 ms  11,489 docs/s
#   xla_b256                   12.632 ms  20,266 docs/s   <- 1.76x
#   unroll_b256 (pallas attn)  22.459 ms  11,399 docs/s   (scan is free)
#   prod_b512                  47.401 ms  10,801 docs/s
#   prod_b1024                 99.479 ms  10,294 docs/s   (256 is optimal)
# The Pallas fused-attention kernel was COSTING the ingest bucket 1.76x:
# at seq 128 its per-(batch, head) grid (3072 steps) + the layout
# transposes outweigh keeping the 128x128 score tile in VMEM, and the
# lax.scan tower is not a factor.  probe_embed2 locates the crossover
# (XLA wins <= 256, pallas >= 384); adopted as the per-bucket routed
# attention_impl="tpu" (models/encoder._PALLAS_MIN_SEQ).  bench.py
# headline after adoption: 20,865 docs/s (was 11,525).
