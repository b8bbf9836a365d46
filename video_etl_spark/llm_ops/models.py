"""S15/U1-U7 — executor-local model cache exercised by a REAL (numpy) model.

The reference ships model checkpoints to workers and lazily initializes one
model per worker process, reusing it across batches (S15; e.g. YOLO init in
`/root/reference/code/workloads/covid/covid_workload.py:46-66`, feature
extractors in `workloads/transMOT/feature_extraction.py:10-89`).  Torch/TF
aren't in this container, so the pattern is proven end-to-end with a small
fixed-weight numpy MLP: the weights are deterministic (seeded, dyadic
rationals), the forward pass is real matrix math, and the scalar-iterator
pandas UDF below initializes the model ONCE per executor python worker —
never per batch — exactly the lazy-cache shape a cv2/torch model plugs
into.

Cross-engine checkability: inputs are md5-derived bytes, weights are exact
in both engines (k/16 has a finite 4-digit decimal expansion), the forward
pass runs in float64, and outputs are quantized to BIGINT at 1e6 — so a
DuckDB oracle can replay the entire MLP in SQL (generated from the same
weights by :func:`mlp_oracle_sql`) and hash-match bit-for-bit.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

D_IN = 16
D_HID = 8
D_OUT = 4
_Q_SCALE = 1_000_000


def _build_weights(seed: int = 7) -> dict[str, np.ndarray]:
    """Deterministic dyadic weights: integers in [-8, 8] divided by 16, so
    every weight has an exact 4-decimal representation that Spark-side numpy
    and DuckDB SQL literals parse to the identical double."""
    rng = np.random.default_rng(seed)
    return {
        "w1": rng.integers(-8, 9, (D_IN, D_HID)).astype(np.float64) / 16.0,
        "b1": rng.integers(-8, 9, D_HID).astype(np.float64) / 16.0,
        "w2": rng.integers(-8, 9, (D_HID, D_OUT)).astype(np.float64) / 16.0,
        "b2": rng.integers(-8, 9, D_OUT).astype(np.float64) / 16.0,
    }


class TinyMLPEmbedder:
    """16 -> tanh(8) -> 4 embedder over md5-byte features (float64)."""

    def __init__(self, seed: int = 7) -> None:
        w = _build_weights(seed)
        self.w1, self.b1, self.w2, self.b2 = w["w1"], w["b1"], w["w2"], w["b2"]

    @staticmethod
    def featurize(payloads: pd.Series) -> np.ndarray:
        """(N, 16) float64 features: bytes of md5(payload), centered."""
        buf = b"".join(hashlib.md5(p).digest() for p in payloads)
        raw = np.frombuffer(buf, dtype=np.uint8).reshape(-1, D_IN)
        return (raw.astype(np.float64) - 127.5) / 127.5

    def embed(self, payloads: pd.Series) -> np.ndarray:
        x = self.featurize(payloads)
        h = np.tanh(x @ self.w1 + self.b1)
        return h @ self.w2 + self.b2

    def embed_quantized(self, payloads: pd.Series) -> np.ndarray:
        """(N, 4) int64 — round(y * 1e6), the oracle-comparable form."""
        return np.rint(self.embed(payloads) * _Q_SCALE).astype(np.int64)


# Executor-local lazy cache (S15).  Keyed per process; a worker builds the
# model on its first batch and reuses it for every later batch/task while
# the python worker is alive (spark.python.worker.reuse=true default).
_MODEL_CACHE: dict[str, TinyMLPEmbedder] = {}


def get_model(
    name: str = "tiny-mlp", on_init: Callable[[], None] | None = None
) -> TinyMLPEmbedder:
    model = _MODEL_CACHE.get(name)
    if model is None:
        model = TinyMLPEmbedder()
        _MODEL_CACHE[name] = model
        if on_init is not None:
            on_init()
    return model


def mlp_embed_quantized(
    frames: DataFrame,
    payload_col: str = "payload",
    init_counter=None,
    model_name: str = "tiny-mlp",
) -> DataFrame:
    """Scalar-iterator pandas UDF: one lazy model init per executor worker.

    ``init_counter``: optional Spark accumulator, incremented once per
    actual model construction (tests assert inits ≤ workers << batches).
    Output: 4 BIGINT columns q0..q3 (quantized embedding dims).
    """
    from video_etl_spark.session import ensure_executor_package

    ensure_executor_package(frames.sparkSession)

    on_init = (lambda: init_counter.add(1)) if init_counter is not None else None

    def run(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # Iterator form: the model is resolved once per worker via the
        # process-level cache, not once per Arrow batch.
        model = get_model(model_name, on_init=on_init)
        for payloads in batches:
            q = model.embed_quantized(payloads)
            yield pd.Series(list(q))

    udf = pandas_udf(run, T.ArrayType(T.LongType()))
    out = frames.withColumn("_q", udf(F.col(payload_col)))
    cols = [
        F.element_at("_q", i + 1).alias(f"q{i}") for i in range(D_OUT)
    ]
    return out.select("doc_id", *cols)


def mlp_oracle_sql(where: str = "doc_id % 2 = 0") -> str:
    """Generate the DuckDB SQL that replays the MLP bit-for-bit.

    The payload is the 32-char md5(text) hex string, so feature byte i is
    byte i of md5(md5(text)).  Weights are inlined as exact 4-decimal
    literals; the output is quantized to BIGINT at 1e6 (float64 sum-order
    and tanh-ulp differences are ~1e-15 — nine orders below the grid).
    """
    w = _build_weights()

    def lit(v: float) -> str:
        return f"{v:.4f}"

    x = [
        f"((CAST(('0x' || substr(h2, {2 * i + 1}, 2)) AS BIGINT) - 127.5) / 127.5)"
        for i in range(D_IN)
    ]
    hidden = []
    for j in range(D_HID):
        terms = " + ".join(
            f"{x[i]} * {lit(w['w1'][i, j])}" for i in range(D_IN)
        )
        # this DuckDB build ships no tanh(); the exp identity agrees with
        # numpy tanh to a few ulp — 9 orders below the 1e-6 output grid
        hidden.append(
            f"(1.0 - 2.0 / (exp(2.0 * ({lit(w['b1'][j])} + {terms})) + 1.0))"
            f" AS h{j}"
        )
    outputs = []
    for k in range(D_OUT):
        terms = " + ".join(
            f"h{j} * {lit(w['w2'][j, k])}" for j in range(D_HID)
        )
        outputs.append(
            f"CAST(round(({lit(w['b2'][k])} + {terms}) * {_Q_SCALE}) AS BIGINT)"
            f" AS q{k}"
        )
    return f"""
    WITH feat AS (
      SELECT doc_id, md5(md5(text)) AS h2 FROM documents WHERE {where}),
    hid AS (
      SELECT doc_id, {", ".join(hidden)} FROM feat)
    SELECT doc_id, {", ".join(outputs)} FROM hid
    """


# ---------------------------------------------------------------------------
# U8 — LFLSTM pattern (reference `workloads/streaming/lflstm.py:56-133`:
# late-fusion LSTM over per-chunk features).  Torch is container-absent, so
# the recurrent cell is pure numpy with the same deterministic dyadic
# weights as the MLP above; the Spark integration is the real shape — an
# applyInPandas over per-key ORDERED sequences with the executor-local
# model cache.  tanh/sigmoid make the outputs non-SQL-replayable, so the
# registered query is rows-only; correctness comes from the per-gate
# differential test (tests/test_llm_ops.py).

L_IN = 1
L_HID = 4


def _lstm_weights(seed: int = 13, in_dim: int = L_IN) -> dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)

    def mat(r, c):
        return rng.integers(-8, 9, (r, c)).astype(np.float64) / 16.0

    return {
        g: {"w": mat(in_dim + L_HID, L_HID), "b": mat(1, L_HID)[0]}
        for g in ("i", "f", "o", "g")
    }


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


class TinyLSTM:
    """Single-layer LSTM cell run over a (T, in_dim) sequence."""

    def __init__(self, seed: int = 13, in_dim: int = L_IN) -> None:
        self.w = _lstm_weights(seed, in_dim)

    def forward_seq(self, seq: np.ndarray) -> np.ndarray:
        """(T, in_dim) -> all hidden states (T, L_HID)."""
        h = np.zeros(L_HID)
        c = np.zeros(L_HID)
        hs = np.zeros((seq.shape[0], L_HID))
        for t in range(seq.shape[0]):
            z = np.concatenate([seq[t], h])
            i = _sigmoid(z @ self.w["i"]["w"] + self.w["i"]["b"])
            f = _sigmoid(z @ self.w["f"]["w"] + self.w["f"]["b"])
            o = _sigmoid(z @ self.w["o"]["w"] + self.w["o"]["b"])
            g = np.tanh(z @ self.w["g"]["w"] + self.w["g"]["b"])
            c = f * c + i * g
            h = o * np.tanh(c)
            hs[t] = h
        return hs

    def forward(self, seq: np.ndarray) -> np.ndarray:
        """(T, in_dim) -> final hidden (L_HID,)."""
        if seq.shape[0] == 0:
            return np.zeros(L_HID)
        return self.forward_seq(seq)[-1]


class TinyBiLSTM2:
    """Two stacked bidirectional LSTM layers with layer norm between —
    the reference's per-modality leg shape (`lflstm.py:67-75`:
    ``rnn1 = nn.LSTM(in, H, bidirectional=True)`` →
    ``layer_norm`` → ``rnn2 = nn.LSTM(2H, H, bidirectional=True)``;
    `lflstm.py:88-96` ``extract_features`` returns the final hidden of
    BOTH layers, each the two directions concatenated)."""

    def __init__(self, seed: int = 13, in_dim: int = L_IN) -> None:
        self.l1f = TinyLSTM(seed, in_dim)
        self.l1b = TinyLSTM(seed + 101, in_dim)
        self.l2f = TinyLSTM(seed + 202, 2 * L_HID)
        self.l2b = TinyLSTM(seed + 303, 2 * L_HID)

    @staticmethod
    def _layer_norm(h: np.ndarray) -> np.ndarray:
        # Per-timestep LN over the feature dim (torch nn.LayerNorm default
        # eps, elementwise affine weights left at identity).
        mu = h.mean(axis=1, keepdims=True)
        var = h.var(axis=1, keepdims=True)
        return (h - mu) / np.sqrt(var + 1e-5)

    def extract_features(self, seq: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(T, in_dim) -> (final_h1, final_h2), each (2*L_HID,).

        Backward direction runs over the reversed sequence; its final
        hidden is the state after consuming the whole reversal (torch's
        h_n for the reverse direction).
        """
        if seq.shape[0] == 0:
            z = np.zeros(2 * L_HID)
            return z, z.copy()
        h1f = self.l1f.forward_seq(seq)                  # (T, H)
        h1b_rev = self.l1b.forward_seq(seq[::-1])        # (T, H), reversed time
        final_h1 = np.concatenate([h1f[-1], h1b_rev[-1]])
        # torch bi-LSTM output: per-timestep concat of fwd state and the
        # bwd state aligned back to original positions
        h1 = np.concatenate([h1f, h1b_rev[::-1]], axis=1)  # (T, 2H)
        normed = self._layer_norm(h1)
        h2f = self.l2f.forward_seq(normed)
        h2b_rev = self.l2b.forward_seq(normed[::-1])
        final_h2 = np.concatenate([h2f[-1], h2b_rev[-1]])
        return final_h1, final_h2


_LSTM_CACHE: dict[str, TinyLSTM] = {}


def get_lstm(
    name: str = "tiny-lstm",
    on_init: Callable[[], None] | None = None,
    seed: int = 13,
) -> TinyLSTM:
    model = _LSTM_CACHE.get(name)
    if model is None:
        model = TinyLSTM(seed)
        _LSTM_CACHE[name] = model
        if on_init is not None:
            on_init()
    return model


_BILSTM_CACHE: dict[str, TinyBiLSTM2] = {}


def get_bilstm(
    name: str,
    on_init: Callable[[], None] | None = None,
    seed: int = 13,
) -> TinyBiLSTM2:
    model = _BILSTM_CACHE.get(name)
    if model is None:
        model = TinyBiLSTM2(seed)
        _BILSTM_CACHE[name] = model
        if on_init is not None:
            on_init()
    return model


def lstm_user_states(
    events: DataFrame,
    max_len: int = 16,
    init_counter=None,
    model_name: str = "tiny-lstm",
) -> DataFrame:
    """Per-user LSTM final state over the time-ordered value sequence.

    applyInPandas per user_id (ONE shuffle on the key); each group sorts
    its own rows by ts — the standard sequence-model-over-keyed-events
    shape.  Output: user_id, seq_len, h0..h3 quantized to 1e6 BIGINTs.
    """
    from video_etl_spark.session import ensure_executor_package

    ensure_executor_package(events.sparkSession)
    on_init = (lambda: init_counter.add(1)) if init_counter is not None else None

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        model = get_lstm(model_name, on_init=on_init)
        # Stable sort + value tiebreak: duplicate (user_id, ts) rows must
        # yield the same sequence regardless of Arrow batch arrival order.
        pdf = pdf.sort_values(["ts", "value"], kind="mergesort").head(max_len)
        seq = (pdf["value"].to_numpy(dtype=np.float64) / 100.0).reshape(-1, 1)
        h = np.rint(model.forward(seq) * 1_000_000).astype(np.int64)
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "seq_len": [int(len(seq))],
                **{f"h{j}": [int(h[j])] for j in range(L_HID)},
            }
        )

    schema = (
        "user_id long, seq_len long, h0 long, h1 long, h2 long, h3 long"
    )
    return events.select("user_id", "ts", "value").groupBy("user_id").applyInPandas(
        run, schema
    )


# --------------------------------------------------------------------------
# U8 (full) — LATE-FUSION LSTM assembled end-to-end (reference
# `workloads/streaming/lflstm.py:56-133`): three modality legs (text /
# visual / acoustic), each a TWO-LAYER BIDIRECTIONAL LSTM with layer norm
# between the layers (`lflstm.py:67-75`), late-fused by concatenating the
# final hidden states of BOTH layers and BOTH directions per leg
# (`lflstm.py:112-114`: cat of final_h1/final_h2 × 3 modalities =
# sum(hidden)*4 features) into a fusion FC head that emits logits + a
# label — extract_features×3 → cat → fc1 → relu → fc2, re-expressed as ONE
# applyInPandas over per-key sequences (one shuffle on the key; every leg
# runs inside the same group pass, so the three modalities are never
# joined post-hoc).  Torch is container-absent (sanctioned), so the legs
# are the differential-tested numpy TinyBiLSTM2 with per-modality weight
# seeds; the MOSEI-shaped modality channels are deterministic functions of
# the event row, making the whole pipeline replayable by the
# single-process numpy reference in the tests.

_LF_SEEDS = {"text": 13, "visual": 17, "acoustic": 19}
_LF_LABELS = 3
# Per-leg fused feature width: final_h1 (2H) + final_h2 (2H).
_LF_LEG_DIM = 4 * L_HID


def _lf_fc_weights(seed: int = 23) -> dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)

    def mat(r, c):
        return rng.integers(-8, 9, (r, c)).astype(np.float64) / 16.0

    return {
        "fc1_w": mat(3 * _LF_LEG_DIM, L_HID),
        "fc1_b": mat(1, L_HID)[0],
        "fc2_w": mat(L_HID, _LF_LABELS),
        "fc2_b": mat(1, _LF_LABELS)[0],
    }


def lf_modality_channels(values: np.ndarray) -> dict[str, np.ndarray]:
    """Deterministic MOSEI-shaped modality channels from event values.

    Stands in for the reference's text(300)/visual(35)/acoustic(74)
    feature streams: each channel is a pure function of the row value, so
    any engine (or the numpy test reference) recomputes them identically.
    """
    return {
        "text": values / 100.0,
        "visual": np.mod(values * 3.0, 50.0) / 50.0,
        "acoustic": np.mod(values * 7.0, 30.0) / 30.0,
    }


def lflstm_forward(values: np.ndarray) -> tuple[np.ndarray, int]:
    """Single-sequence forward pass: 3 two-layer bi-LSTM legs → concat of
    both layers' final hiddens → fc1 → ReLU → fc2 → (logits, argmax
    label).  Pure numpy; shared by the Spark query and the differential
    test."""
    chans = lf_modality_channels(values)
    hs = []
    for mod, seed in _LF_SEEDS.items():
        leg = get_bilstm(f"lf-{mod}", seed=seed)
        f1, f2 = leg.extract_features(chans[mod].reshape(-1, 1))
        hs.append(np.concatenate([f1, f2]))  # (4*L_HID,) per leg
    h = np.concatenate(hs)  # (3*4*L_HID,) — the reference's torch.cat
    fc = _lf_fc_weights()
    z1 = np.maximum(h @ fc["fc1_w"] + fc["fc1_b"], 0.0)
    logits = z1 @ fc["fc2_w"] + fc["fc2_b"]
    return logits, int(np.argmax(logits))


def lflstm_fusion(
    events: DataFrame,
    max_len: int = 16,
    init_counter=None,
) -> DataFrame:
    """Per-user late-fusion forward pass over the time-ordered event
    sequence.  Output: user_id, seq_len, label, logit0..2 quantized to
    1e6 BIGINTs (exact cross-run comparison)."""
    from video_etl_spark.session import ensure_executor_package

    ensure_executor_package(events.sparkSession)
    on_init = (lambda: init_counter.add(1)) if init_counter is not None else None

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        if on_init is not None:
            get_bilstm("lf-text", seed=_LF_SEEDS["text"], on_init=on_init)
        # Stable sort + value tiebreak (same determinism contract as
        # lstm_user_states): duplicate (user_id, ts) rows sequence
        # identically regardless of input partition order.
        pdf = pdf.sort_values(["ts", "value"], kind="mergesort").head(max_len)
        values = pdf["value"].to_numpy(dtype=np.float64)
        logits, label = lflstm_forward(values)
        q = np.rint(logits * 1_000_000).astype(np.int64)
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "seq_len": [int(len(values))],
                "label": [label],
                **{f"logit{j}": [int(q[j])] for j in range(_LF_LABELS)},
            }
        )

    schema = "user_id long, seq_len long, label long, logit0 long, logit1 long, logit2 long"
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(run, schema)
    )
