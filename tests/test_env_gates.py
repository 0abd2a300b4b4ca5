"""The single per-round record of the three environment-gated seams
(VERDICT r11 #5). Each test probes its dependency; while absent it SKIPS
with the canonical reason string, and the round a dependency appears the
test turns into a real exercise of the gated path — so un-gating is
noticed by the suite, not by re-reading round notes.

The seams (SURVEY.md §2 documents each at its operator row):
1. google.protobuf      -> transformWithStateInPandas execution
                           (construction/schema verified in
                           tests/test_streaming.py; applyInPandasWithState
                           covers the capability meanwhile)
2. PIL / ffmpeg / cv2   -> real multimodal pixel/audio decode
                           (operators/multimodal.py mapInPandas plumbing is
                           oracled to the Arrow boundary; decode stubs at
                           the documented NotImplementedError seam)
3. spark-sql-kafka jar  -> real format("kafka") execution
                           (streaming/sources.py builds the reader; the
                           loopback seam reproduces schema + all three
                           offset-seek modes, driver-green r9)
"""

from __future__ import annotations

import glob
import importlib.util
import os
import shutil

import pytest


def _has_module(name: str) -> bool:
    try:
        return importlib.util.find_spec(name) is not None
    except (ImportError, ModuleNotFoundError):
        return False


def test_gate_protobuf_transform_with_state():
    """transformWithStateInPandas needs google.protobuf at runtime."""
    if not _has_module("google.protobuf"):
        pytest.skip(
            "env gate: google.protobuf absent (re-probed this round) -- "
            "transformWithStateInPandas execution stays construction-only; "
            "applyInPandasWithState covers arbitrary keyed state meanwhile"
        )
    # dependency appeared: execute the real thing so the construction-only
    # status in SURVEY §2.8 can be upgraded -- run the tws twin against the
    # batch oracle exactly like test_streaming's applyInPandasWithState test
    from rlink_rs_spark.streaming.stateful import threshold_alerts_tws

    assert callable(threshold_alerts_tws)
    pytest.fail(
        "google.protobuf is now available: promote threshold_alerts_tws to "
        "a real executed parity test (mirror test_streaming.py's "
        "applyInPandasWithState oracle test) and update SURVEY §2.8"
    )


def test_gate_multimodal_decode():
    """Real image/audio decode needs PIL (or cv2) / ffmpeg."""
    have = {
        "PIL": _has_module("PIL"),
        "cv2": _has_module("cv2"),
        "ffmpeg": shutil.which("ffmpeg") is not None,
        "soundfile": _has_module("soundfile"),
    }
    if not any(have.values()):
        pytest.skip(
            f"env gate: no decode backend ({have}) -- multimodal decode "
            "stubs at the documented seam in operators/multimodal.py; the "
            "mapInPandas plumbing (schema, batching, digest passthrough) "
            "is tested without it"
        )
    pytest.fail(
        f"a decode backend appeared ({have}): replace the _fake_decode seam "
        "in operators/multimodal.py with the real decoder and add a pixel-"
        "level parity test; update SURVEY §2 multimodal row"
    )


def test_gate_kafka_jar():
    """format('kafka') needs the spark-sql-kafka connector jar (+ broker)."""
    import pyspark

    jars = glob.glob(os.path.join(os.path.dirname(pyspark.__file__), "jars", "*kafka*"))
    extra = os.environ.get("SPARK_GRAFT_KAFKA_JARS", "")
    if not jars and not extra:
        pytest.skip(
            "env gate: no spark-sql-kafka jar in pyspark/jars and no "
            "SPARK_GRAFT_KAFKA_JARS override -- format('kafka') execution "
            "unverified; the loopback seam (sources/loopback.py) carries "
            "schema + offset-seek parity (driver-green r9)"
        )
    pytest.fail(
        "a kafka connector jar appeared: execute streaming/sources.py's "
        "kafka_stream against an embedded/loopback broker and upgrade the "
        "KafkaInputFormat row in SURVEY §2.1 from partial"
    )
