"""Triton logging + trace extension analogs.

The reference deploys stock Triton (README.md:41-55), whose server
exposes the logging extension (GET/POST /v2/logging; tritonclient
get/update_log_settings) and the trace extension (GET/POST
/v2/trace/setting; get/update_trace_settings). Here the same documents
control `utils/logging.py`'s runtime switches and `serve/tracing.py`'s
sampled per-request timestamp records.
"""

from __future__ import annotations

import io
import json

import pytest


@pytest.fixture()
def restore_log_settings():
    from human_body_proportion_estimation_tpu.utils.logging import (
        configure_logging,
        log_settings,
    )

    before = log_settings()
    yield
    configure_logging(before)


@pytest.fixture()
def fresh_tracer(monkeypatch, tmp_path):
    """A private RequestTracer installed as the global singleton so
    tests never leak settings into other suites."""
    from human_body_proportion_estimation_tpu.serve import tracing

    tracer = tracing.RequestTracer()
    tracer.trace_file = str(tmp_path / "trace.json")
    monkeypatch.setattr(tracing, "TRACER", tracer)
    return tracer


# --------------------------------------------------------------------- #
# logging extension


def test_log_settings_validation(restore_log_settings):
    from human_body_proportion_estimation_tpu.utils.logging import (
        configure_logging,
        log_settings,
    )

    doc = log_settings()
    assert doc == {
        "log_info": True, "log_warning": True, "log_error": True,
        "log_verbose_level": 0, "log_format": "default", "log_file": "",
    }
    out = configure_logging({"log_info": False, "log_verbose_level": 2})
    assert out["log_info"] is False and out["log_verbose_level"] == 2

    for bad in ({"nope": 1}, {"log_info": "yes"},
                {"log_verbose_level": -1}, {"log_verbose_level": True},
                {"log_format": "rfc3339"}, {"log_file": 7}):
        with pytest.raises(ValueError):
            configure_logging(bad)


def test_log_switches_control_emission(restore_log_settings):
    from human_body_proportion_estimation_tpu.utils.logging import (
        JsonLogger,
        configure_logging,
    )

    buf = io.StringIO()
    log = JsonLogger("t", level="debug", stream=buf)

    log.info("a")
    log.debug("hidden")  # verbose level 0 -> no debug records
    configure_logging({"log_info": False, "log_verbose_level": 1})
    log.info("suppressed")
    log.debug("verbose_on")
    configure_logging({"log_info": True, "log_format": "ISO8601"})
    log.info("iso")

    records = [json.loads(line) for line in buf.getvalue().splitlines()]
    assert [r["event"] for r in records] == ["a", "verbose_on", "iso"]
    assert isinstance(records[0]["ts"], float)
    assert isinstance(records[2]["ts"], str) and \
        records[2]["ts"].endswith("Z")


def test_log_file_redirect(restore_log_settings, tmp_path):
    from human_body_proportion_estimation_tpu.utils.logging import (
        JsonLogger,
        configure_logging,
    )

    buf = io.StringIO()
    log = JsonLogger("t", stream=buf)
    path = tmp_path / "server.log"
    configure_logging({"log_file": str(path)})
    log.info("to_file")
    configure_logging({"log_file": ""})
    log.info("to_stream")

    assert json.loads(path.read_text())["event"] == "to_file"
    assert json.loads(buf.getvalue())["event"] == "to_stream"


# --------------------------------------------------------------------- #
# trace extension


def test_trace_settings_document_and_validation(fresh_tracer):
    doc = fresh_tracer.settings()
    # Triton's wire form: string-valued numbers, list-valued level
    assert doc["trace_level"] == ["OFF"]
    assert doc["trace_rate"] == "1000" and doc["trace_count"] == "-1"

    out = fresh_tracer.update(
        {"trace_level": ["TIMESTAMPS"], "trace_rate": "5",
         "trace_count": 2, "log_frequency": "0"}
    )
    assert out["trace_level"] == ["TIMESTAMPS"]
    assert out["trace_rate"] == "5" and out["trace_count"] == "2"

    for bad in ({"trace_level": "TIMESTAMPS"}, {"trace_level": ["LOUD"]},
                {"trace_level": []}, {"trace_rate": 0},
                {"trace_rate": "x"}, {"trace_count": -2},
                {"log_frequency": -1}, {"trace_file": ""},
                {"mystery": 1}):
        with pytest.raises(ValueError):
            fresh_tracer.update(bad)


def test_trace_sampling_rate_and_count(fresh_tracer):
    fresh_tracer.update({"trace_level": ["TIMESTAMPS"], "trace_rate": 3,
                         "trace_count": 2})
    # every 3rd request sampled, stopping after trace_count traces
    picks = [fresh_tracer.sample() for _ in range(12)]
    assert picks == [True, False, False, True, False, False,
                     False, False, False, False, False, False]
    assert fresh_tracer.settings()["trace_count"] == "0"
    fresh_tracer.update({"trace_level": ["OFF"]})
    assert fresh_tracer.sample() is False


def test_trace_records_through_dynamic_batcher(fresh_tracer):
    from human_body_proportion_estimation_tpu.serve.batching import (
        DynamicBatcher,
    )

    fresh_tracer.update({"trace_level": ["TIMESTAMPS"], "trace_rate": 1})
    batcher = DynamicBatcher(lambda xs: [x * 2 for x in xs],
                             max_batch=4, batch_timeout_ms=2,
                             trace_name="toy_model")
    try:
        assert [batcher.infer(i) for i in range(3)] == [0, 2, 4]
    finally:
        batcher.shutdown()
    fresh_tracer.flush()

    lines = [json.loads(ln) for ln in
             open(fresh_tracer.trace_file, encoding="utf-8")]
    assert len(lines) == 3
    for rec in lines:
        assert rec["model"] == "toy_model"
        ts = rec["timestamps"]
        assert ts["QUEUE_START"] <= ts["COMPUTE_START"] <= \
            ts["COMPUTE_END"]
        assert 1 <= rec["batch_size"] <= 4


def test_log_file_unopenable_is_400_and_keeps_old_sink(
        restore_log_settings, tmp_path):
    """An unopenable log_file maps to the extension's 400 contract
    (ValueError) and leaves the previous settings + sink intact
    (advisor r4: OSError used to escape after mutating the document)."""
    from human_body_proportion_estimation_tpu.utils.logging import (
        JsonLogger,
        configure_logging,
        log_settings,
    )

    buf = io.StringIO()
    log = JsonLogger("t", stream=buf)
    good = tmp_path / "good.log"
    configure_logging({"log_file": str(good)})
    with pytest.raises(ValueError):
        configure_logging({"log_file": str(tmp_path / "no" / "dir.log")})
    assert log_settings()["log_file"] == str(good)
    log.info("still_good")  # the good sink must still be open
    assert json.loads(good.read_text())["event"] == "still_good"


def test_trace_write_failure_never_raises_and_disables(fresh_tracer):
    """OSError on trace_file append must not propagate into the batcher
    completion loops (advisor r4 medium): the record is dropped and
    tracing auto-disables."""
    fresh_tracer.update({"trace_level": ["TIMESTAMPS"], "trace_rate": 1})
    fresh_tracer.trace_file = fresh_tracer.trace_file + "/not/a/dir"
    assert fresh_tracer.sample()
    fresh_tracer.record("m", {"COMPUTE_START": 1})  # must not raise
    assert fresh_tracer.settings()["trace_level"] == ["OFF"]
    assert fresh_tracer.sample() is False
    fresh_tracer.flush()  # buffered records were dropped; still no raise


def test_trace_log_frequency_buffers(fresh_tracer):
    fresh_tracer.update({"trace_level": ["TIMESTAMPS"], "trace_rate": 1,
                         "log_frequency": 10})
    assert fresh_tracer.sample()
    fresh_tracer.record("m", {"COMPUTE_START": 1, "COMPUTE_END": 2})
    import os

    assert not os.path.exists(fresh_tracer.trace_file)  # buffered
    fresh_tracer.flush()
    assert json.loads(
        open(fresh_tracer.trace_file, encoding="utf-8").read()
    )["model"] == "m"
