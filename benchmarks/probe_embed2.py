"""Probe: does XLA attention also beat the Pallas kernel at the OTHER
production shapes?  probe_embed measured batch-256 x seq-128 (the ingest
bucket): XLA 20.3k docs/s vs Pallas 11.5k.  Before flipping the encoder's
auto attention choice, check the long-document bucket (seq 512) and the
single-query latency shape (batch 1, seq 64 — the fused serve program's
encode) the same interleaved way.

See `# RESULT` at the bottom after a hardware run.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from perceive_tpu.models import EncoderArch, HeadConfig
from perceive_tpu.models import encoder as enc

R = 4
ROUNDS = 8

ARCH = EncoderArch(
    vocab_size=30522, hidden_size=384, num_layers=6, num_heads=12,
    intermediate_size=1536, max_position_embeddings=512,
)
HEAD = HeadConfig(pooling="mean", normalize=True)


def main():
    on_tpu = jax.default_backend() == "tpu"
    impl_p = "pallas" if on_tpu else "xla"
    params = enc.init_params(jax.random.PRNGKey(0), ARCH, HEAD)

    def ids(seed, reps, batch, seq):
        k = jax.random.PRNGKey(seed)
        i = jax.random.randint(k, (reps, batch, seq), 0, ARCH.vocab_size, jnp.int32)
        m = jnp.ones((reps, batch, seq), jnp.int32)
        return jax.block_until_ready(i), m

    def make(reps, impl):
        def f(p, i, m):
            def it(j, acc):
                e = enc.encode_tokens(
                    p, ARCH, HEAD, i[j], m[j],
                    compute_dtype=jnp.bfloat16, attention_impl=impl,
                )
                return acc + jnp.sum(e)
            return jax.lax.fori_loop(0, reps, it, 0.0)
        return jax.jit(f)

    cases = {
        "pallas_s512_b64": (64, 512, impl_p),
        "xla_s512_b64": (64, 512, "xla"),
        "pallas_s384_b96": (96, 384, impl_p),
        "xla_s384_b96": (96, 384, "xla"),
    }
    fns = {}
    for name, (batch, seq, impl) in cases.items():
        try:
            f1, fR = make(1, impl), make(R, impl)
            np.asarray(f1(params, *ids(1, 1, batch, seq)))
            np.asarray(fR(params, *ids(1, R, batch, seq)))
            fns[name] = (f1, fR, batch, seq)
        except Exception as e:  # noqa: BLE001
            print(f"# case {name} unavailable ({e})", flush=True)
    marg = {name: [] for name in fns}
    for rnd in range(ROUNDS):
        for name, (f1, fR, batch, seq) in fns.items():
            i1, m1 = ids(1000 + 31 * rnd, 1, batch, seq)
            t0 = time.perf_counter()
            np.asarray(f1(params, i1, m1))
            w1 = time.perf_counter() - t0
            iR, mR = ids(5000 + 31 * rnd, R, batch, seq)
            t0 = time.perf_counter()
            np.asarray(fR(params, iR, mR))
            wR = time.perf_counter() - t0
            marg[name].append(max((wR - w1) / (R - 1), 1e-9))
    for name, s in marg.items():
        arr = np.array(s)
        batch = fns[name][2]
        med = np.median(arr)
        print(
            f"{name:16s} p50 {med * 1e3:8.3f} ms  "
            f"IQR [{np.percentile(arr, 25) * 1e3:8.3f}, {np.percentile(arr, 75) * 1e3:8.3f}]  "
            f"docs/s {batch / med:9.1f}",
            flush=True,
        )


if __name__ == "__main__":
    main()


# RESULT (1x v5e-class chip via tunnel, 2026-08-19, interleaved; the
# s256/q1 rows are from the first run of this probe, the s384 rows from
# the second — s512 re-measured within noise across both):
#   pallas_s512_b64   18.05 ms   3,545 docs/s   xla_s512_b64   23.48 ms  2,726
#   pallas_s384_b96   20.80 ms   4,615 docs/s   xla_s384_b96   21.49 ms  4,467
#   pallas_s256_b128  18.93 ms   6,762 docs/s   xla_s256_b128  16.60 ms  7,712
#   pallas_q1_s64     ~0.01-0.03 ms              xla_q1_s64    ~0.05-0.12 ms
#     (single-query marginals are below the method's resolution; ties)
# Crossover between 256 and 384 -> _PALLAS_MIN_SEQ = 384: the kernel's
# (S,S)-in-VMEM design wins once the score tensor's HBM round trip
# dominates (seq >= 384), XLA's einsum+softmax wins below it.
