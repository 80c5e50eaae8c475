"""Model façade: tokenizer + params + jitted encode functions.

Role of the reference's Model (/root/reference/crates/perceive-core/
model.rs:68-190): owns the tokenizer, loads weights, exposes
``encode([texts]) -> vectors`` and ``encode_tokens``.  The reference shipped
every encode through a dedicated worker thread over a bounded channel because
libtorch wants single-threaded ownership; JAX dispatch is thread-safe and
async, so the device queue itself plays that role — callers just invoke the
jitted function (the ingest pipeline adds host-side backpressure in
perceive_tpu.sources.pipeline).

Shape policy: token batches are padded to (batch bucket) x (seq bucket) so a
handful of jit specializations cover all traffic; each specialization is
compiled once and cached by XLA.
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .encoder import EncoderArch, HeadConfig, encode_tokens as _encode_tokens, init_params, output_dim
from .registry import ModelType, checkpoint_path
from .tokenize import TextTokenizer, TokenBatch

BATCH_BUCKETS = (1, 8, 16, 32, 64, 128, 256, 512, 1024)


def batch_bucket(n: int) -> int:
    for b in BATCH_BUCKETS:
        if b >= n:
            return b
    return BATCH_BUCKETS[-1]


class ModelError(Exception):
    """Encode failed (reference model.rs:29-48 ModelError)."""


class Model:
    def __init__(
        self,
        params,
        arch: EncoderArch,
        head: HeadConfig,
        tokenizer: TextTokenizer,
        *,
        model_id: int = -1,
        model_version: int = 0,
        compute_dtype=jnp.bfloat16,
        attention_impl: str = "auto",
        name: str = "custom",
    ):
        self.params = params
        self.arch = arch
        self.head = head
        self.tokenizer = tokenizer
        self.model_id = model_id
        self.model_version = model_version
        self.name = name
        if attention_impl == "auto":
            # keyed on where the params live, not the process default backend
            # (a CPU-mesh model in a TPU-attached container must not pick the
            # compiled Pallas kernel; see utils.platform).  "tpu" routes per
            # sequence bucket: XLA attention below _PALLAS_MIN_SEQ, the
            # Pallas kernel at/above it (measured crossover,
            # encoder._attention) — a blanket "pallas" cost the ingest
            # bucket (seq 128) 1.76x of its throughput.
            from ..utils.platform import platform_of

            leaves = jax.tree.leaves(params)
            plat = platform_of(leaves[0] if leaves else None)
            attention_impl = "tpu" if plat == "tpu" else "xla"
        # self.attention_impl is set by _build_jits below (its one home)
        self.compute_dtype = compute_dtype
        # multi-chip state (shard_over): mesh, data-axis size, batch sharding
        self._mesh = None
        self._data_parallel = 1
        self._batch_sharding = None
        self._encode_ids_dp = None
        self._build_jits(attention_impl)

    def _build_jits(self, attention_impl: str) -> None:
        arch, head, compute_dtype = self.arch, self.head, self.compute_dtype
        self.attention_impl = attention_impl

        def fn(params, ids, mask, type_ids):
            return _encode_tokens(
                params,
                arch,
                head,
                ids,
                mask,
                type_ids,
                compute_dtype=compute_dtype,
                attention_impl=attention_impl,
            )

        self._encode_fn = fn
        self._encode_jit = jax.jit(fn)

        # ids-only variant for the ingest dispatch path: the attention mask
        # is derivable on device (mask = ids != pad, exactly the reference's
        # rule, model/tokenize.rs generate_token_tensors) and type ids are
        # zero for sentence encoders — shipping one (B, S) array instead of
        # three cuts host->device bytes 3x and skips two host array builds
        # (the ingest host is single-core; see sources/pipeline._embed_stage)
        pad_id = self.tokenizer.pad_id

        def fn_ids(params, ids):
            mask = (ids != pad_id).astype(jnp.int32)
            return fn(params, ids, mask, jnp.zeros_like(ids))

        self._encode_ids_fn = fn_ids
        self._encode_ids_jit = jax.jit(fn_ids)

    # -- multi-chip ----------------------------------------------------------

    def shard_over(self, mesh) -> "Model":
        """Scale encoding over a device mesh (SURVEY.md §2 DP/TP rows).

        With the mesh's ``model`` axis at 1 (the MiniLM-class default), the
        ingest encode runs data-parallel through shard_map — params
        replicated, token batches split on the ``data`` axis, the Pallas
        attention kernel intact per chip.  With model parallelism > 1 the
        params get the Megatron TP shardings (parallel/mesh._LAYER_SPECS)
        and GSPMD partitions the tower (attention falls back to the XLA path
        — pallas_call is opaque to GSPMD propagation; shard_map is how the
        DP case keeps the kernel).  Batches whose bucket doesn't divide the
        data axis (single queries) run through the plain jit on replicated
        params."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import (
            DATA_AXIS,
            MODEL_AXIS,
            batch_sharding,
            replicated,
            shard_params,
        )

        from ..utils.platform import platform_of

        self._mesh = mesh
        self._data_parallel = mesh.shape[DATA_AXIS]
        self._batch_sharding = batch_sharding(mesh)
        if self.attention_impl in ("pallas", "tpu") and platform_of(mesh) != "tpu":
            # re-key on where the MESH lives: params resolved "tpu" at
            # construction, but sharding onto a CPU mesh (the multichip
            # dryrun topology) would launch compiled Mosaic kernel code on
            # CPU devices at seq >= the routing threshold — the exact
            # failure utils/platform.py documents (review r3; the MP branch
            # below handled it, the DP branch didn't)
            self._build_jits("xla")
        if mesh.shape[MODEL_AXIS] > 1:
            if self.attention_impl in ("pallas", "tpu"):
                # GSPMD can't propagate through pallas_call; the routed
                # "tpu" impl could still pick the kernel at long buckets
                self._build_jits("xla")
            self.params = shard_params(self.params, mesh)
            self._encode_ids_dp = None
        else:
            self.params = jax.device_put(self.params, replicated(mesh))
            self._encode_ids_dp = jax.jit(
                shard_map(
                    self._encode_ids_fn,
                    mesh=mesh,
                    in_specs=(P(), P(DATA_AXIS, None)),
                    out_specs=P(DATA_AXIS, None),
                )
            )
        return self

    def _dispatch_ids(self, ids):
        """Launch the ids-only encode with mesh-aware placement.  The mesh
        path device_puts the HOST array straight to the batch sharding (one
        per-shard transfer); staging through jnp.asarray first would copy
        the full batch to the default device and THEN reshard — a redundant
        whole-batch transfer per ingest dispatch (review r3)."""
        from ..utils import dispatchmeter

        dispatchmeter.count("encode")
        n = ids.shape[0] if hasattr(ids, "shape") else len(ids)
        if self._mesh is not None and n % self._data_parallel == 0:
            a = jax.device_put(np.asarray(ids), self._batch_sharding)
            if self._encode_ids_dp is not None:
                return self._encode_ids_dp(self.params, a)
            return self._encode_ids_jit(self.params, a)
        return self._encode_ids_jit(self.params, jnp.asarray(ids))

    # -- constructors --------------------------------------------------------

    @classmethod
    def new_pretrained(
        cls,
        model_type: ModelType | str | Path,
        *,
        compute_dtype=jnp.bfloat16,
        attention_impl: str = "auto",
    ) -> "Model":
        """Load a sentence-transformers checkpoint (registry entry or path).

        Analog of reference Model::new_pretrained (model.rs:68-174).
        """
        from .convert import load_sentence_transformer

        model_id, version, name = -1, 0, str(model_type)
        if isinstance(model_type, str) and not Path(model_type).exists():
            model_type = ModelType.parse(model_type)
        if isinstance(model_type, ModelType):
            path = checkpoint_path(model_type)
            if path is None:
                raise ModelError(
                    f"no checkpoint for {model_type.value} under the model-data dir; "
                    "place a sentence-transformers export there "
                    "(see perceive_tpu/models/registry.py)"
                )
            model_id, name = model_type.model_id, model_type.value
        else:
            path = Path(model_type)

        params, arch, head, max_seq = load_sentence_transformer(path)
        tokenizer = TextTokenizer.from_dir(path, max_seq_length=max_seq)
        return cls(
            params,
            arch,
            head,
            tokenizer,
            model_id=model_id,
            model_version=version,
            compute_dtype=compute_dtype,
            attention_impl=attention_impl,
            name=name,
        )

    @classmethod
    def random(
        cls,
        arch: EncoderArch,
        head: HeadConfig,
        tokenizer: TextTokenizer,
        *,
        seed: int = 0,
        compute_dtype=jnp.float32,
        attention_impl: str = "xla",
        model_id: int = -1,
    ) -> "Model":
        """Randomly initialized model (tests, benchmarks, fixtures)."""
        params = init_params(jax.random.PRNGKey(seed), arch, head)
        return cls(
            params,
            arch,
            head,
            tokenizer,
            model_id=model_id,
            compute_dtype=compute_dtype,
            attention_impl=attention_impl,
            name="random",
        )

    # -- encoding ------------------------------------------------------------

    @property
    def dim(self) -> int:
        return output_dim(self.arch, self.head)

    def encode_token_batch(self, batch: TokenBatch) -> np.ndarray:
        """(B, S) token arrays -> (B, dim) f32 embeddings."""
        try:
            out = self._encode_jit(
                self.params,
                jnp.asarray(batch.input_ids),
                jnp.asarray(batch.attention_mask),
                jnp.asarray(batch.token_type_ids),
            )
            return np.asarray(out)
        except Exception as e:  # error isolation per batch (worker.rs:71-74)
            raise ModelError(f"encode failed: {e}") from e

    def encode(self, texts: Sequence[str], *, max_batch: int = 256) -> np.ndarray:
        """Texts -> (N, dim) f32 embeddings, chunked into bucketed batches."""
        if not texts:
            return np.zeros((0, self.dim), dtype=np.float32)
        # clamp to the bucket ladder: a larger max_batch would make
        # batch_bucket under-pad the chunk and die with a raw tokenizer
        # error from the wrong layer (review r3)
        max_batch = min(max_batch, BATCH_BUCKETS[-1])
        outs = []
        for start in range(0, len(texts), max_batch):
            chunk = list(texts[start : start + max_batch])
            tb = self.tokenizer.encode_batch(chunk, pad_batch_to=batch_bucket(len(chunk)))
            emb = self.encode_token_batch(tb)
            outs.append(emb[: len(chunk)])
        return np.concatenate(outs, axis=0)

    def encode_dispatch(self, texts: Sequence[str]):
        """Tokenize + launch the jitted encode WITHOUT materializing.

        Returns a device array future; call ``np.asarray`` on it (or
        ``materialize``) later.  This is the double-buffering hook for the
        ingest pipeline: JAX dispatch is async, so the host can tokenize the
        next batch while the TPU encodes this one (replaces the reference's
        worker-thread channel hop, model.rs:161-190).
        """
        chunk = list(texts)
        return self._dispatch_chunk(
            chunk, lambda n: self.tokenizer.encode_batch_ids(chunk, pad_batch_to=n)
        )

    def encode_dispatch_token_windows(self, windows):
        """Like ``encode_dispatch`` but for pre-sliced token-id windows (the
        chunk-embedding path): windows are wrapped with the model's special
        tokens and padded host-side, never re-tokenized."""
        windows = list(windows)
        return self._dispatch_chunk(
            windows, lambda n: self.tokenizer.pack_token_windows(windows, pad_batch_to=n)
        )

    def _dispatch_chunk(self, items: list, ids_for):
        """Shared dispatch contract of the two encode_dispatch flavors
        (limit check, bucket padding, launch — review r3: two verbatim
        copies).  ``ids_for(bucket)`` produces the padded id array."""
        if len(items) > BATCH_BUCKETS[-1]:
            raise ModelError(
                f"batch of {len(items)} exceeds the {BATCH_BUCKETS[-1]} dispatch limit"
            )
        ids = ids_for(batch_bucket(len(items)))
        return self._dispatch_ids(ids), len(items)

    @staticmethod
    def materialize(dispatched) -> np.ndarray:
        """Block on a dispatched encode and trim batch padding."""
        out, n = dispatched
        return np.asarray(out)[:n]

    def encode_query(self, query: str) -> np.ndarray:
        """Single query -> (dim,) f32 (reference search.rs:262-264)."""
        return self.encode([query])[0]

    def highlight(self, query: str, documents: Sequence[str], query_emb=None):
        """Best snippet per document (reference model/highlight.rs:23).
        Pass ``query_emb`` to skip the query's device encode (it otherwise
        rides the chunk batch — one dispatch either way)."""
        from .highlight import highlight as _highlight

        return _highlight(self, query, documents, query_emb=query_emb)
