"""OTLP/HTTP telemetry export (reference docs/telemetry.md:3,68,
docs/configuration.md:28-29).  Fully offline: the poster is injected
and the OTLP JSON envelopes are asserted structurally."""

import json

import pytest

from pincette_json_streams_spark.streaming.otlp import (
    OtlpHttpExporter,
    event_trace_record,
    event_traces_to_spans,
    exporter_from_config,
)


class _Recorder:
    def __init__(self):
        self.posts = []

    def __call__(self, url, body, headers):
        self.posts.append((url, json.loads(body), headers))
        return 200


def _exporter(**kw):
    rec = _Recorder()
    exp = OtlpHttpExporter("http://collector:4318/", poster=rec,
                           service_name="my-app", namespace="ns",
                           **kw)
    return exp, rec


class TestLogsEnvelope:
    def test_log_record_shape(self):
        exp, rec = _exporter()
        exp.log_emitter({
            "logger": "my-app", "level": "SEVERE", "message": "boom",
            "attributes": {"part": "s1", "n": 3},
            "trace_id": "a" * 32, "span_id": "a" * 16,
        })
        exp.flush()
        url, body, headers = rec.posts[0]
        assert url == "http://collector:4318/v1/logs"
        assert headers["Content-Type"] == "application/json"
        res = body["resourceLogs"][0]
        rattrs = {a["key"]: a["value"] for a in
                  res["resource"]["attributes"]}
        assert rattrs["service.name"] == {"stringValue": "my-app"}
        assert rattrs["service.namespace"] == {"stringValue": "ns"}
        lr = res["scopeLogs"][0]["logRecords"][0]
        assert lr["severityNumber"] == 17 and lr["severityText"] == "SEVERE"
        assert lr["body"] == {"stringValue": "boom"}
        assert lr["traceId"] == "a" * 32 and lr["spanId"] == "a" * 16
        attrs = {a["key"]: a["value"] for a in lr["attributes"]}
        assert attrs["part"] == {"stringValue": "s1"}
        assert attrs["n"] == {"intValue": "3"}
        assert int(lr["timeUnixNano"]) > 0

    def test_batching_autoflush(self):
        exp, rec = _exporter(batch_size=2)
        exp.log_emitter({"logger": "a", "level": "INFO", "message": "1"})
        assert rec.posts == []
        exp.log_emitter({"logger": "a", "level": "INFO", "message": "2"})
        assert len(rec.posts) == 1  # hit batch_size -> shipped
        records = rec.posts[0][1]["resourceLogs"][0]["scopeLogs"][0][
            "logRecords"]
        assert [r["body"]["stringValue"] for r in records] == ["1", "2"]
        exp.flush()
        assert len(rec.posts) == 1  # nothing buffered -> no empty POST


class TestMetricsEnvelope:
    def test_counter_and_probe(self):
        exp, rec = _exporter()
        exp.probe_producer({"name": "s1", "minute": 1718000040,
                            "count": 42, "topic": "probes"})
        exp.flush()
        url, body, _ = rec.posts[0]
        assert url == "http://collector:4318/v1/metrics"
        m = body["resourceMetrics"][0]["scopeMetrics"][0]["metrics"][0]
        assert m["name"] == "json_streams.messages"
        assert m["sum"]["isMonotonic"] is True
        dp = m["sum"]["dataPoints"][0]
        assert dp["asInt"] == "42"
        assert dp["timeUnixNano"] == str(1718000040 * 10**9)
        attrs = {a["key"]: a["value"] for a in dp["attributes"]}
        assert attrs["part"] == {"stringValue": "s1"}


class TestEventTraces:
    CORR = "0f0f0f0f-1111-2222-3333-444455556666"

    def test_record_shape(self):
        rec = event_trace_record(
            {"_corr": self.CORR, "_jwt": {"sub": "alice"}},
            application="my-app", part="s1", name="s1.out",
            version="1.2", payload={"k": 1}, timestamp_nanos=123,
        )
        assert rec["traceId"] == self.CORR
        assert rec["attributes"]["application"] == "my-app"
        assert rec["attributes"]["profile.frame.type"] == "json-streams"
        assert rec["serviceName"] == "my-app"
        assert rec["serviceNamespace"] == "json-streams"
        assert rec["serviceVersion"] == "1.2"
        assert rec["timestampNanos"] == 123
        assert rec["username"] == "alice"
        assert rec["payload"] == {"k": 1}

    def test_no_corr_no_trace(self):
        assert event_trace_record({}, "a", "p", "n") is None
        assert event_trace_record({"_corr": "not-a-uuid"},
                                  "a", "p", "n") is None

    def test_root_then_children(self):
        tid = self.CORR.replace("-", "")
        events = [
            {"traceId": self.CORR, "timestampNanos": 100, "name": "a.in"},
            {"traceId": self.CORR, "timestampNanos": 200, "name": "a.out"},
            {"traceId": self.CORR, "timestampNanos": 300, "name": "b.in"},
        ]
        spans = event_traces_to_spans(events)
        root, c1, c2 = spans
        assert root["traceId"] == tid
        assert root["spanId"] == tid[:16]
        assert "parentSpanId" not in root
        for c in (c1, c2):
            assert c["parentSpanId"] == tid[:16]
            assert c["spanId"] != tid[:16]
        assert c1["spanId"] != c2["spanId"]
        # one-microsecond spans (docs/telemetry.md:68)
        for s in spans:
            assert int(s["endTimeUnixNano"]) - \
                int(s["startTimeUnixNano"]) == 1000

    def test_seen_state_crosses_batches(self):
        from pincette_json_streams_spark.streaming.otlp import SeenTraces

        seen = SeenTraces()
        b1 = event_traces_to_spans(
            [{"traceId": self.CORR, "timestampNanos": 1, "name": "x"}],
            seen)
        b2 = event_traces_to_spans(
            [{"traceId": self.CORR, "timestampNanos": 2, "name": "y"}],
            seen)
        assert "parentSpanId" not in b1[0]
        assert b2[0]["parentSpanId"] == b1[0]["spanId"]

    def test_child_span_ids_unique_even_when_batch_stamped(self):
        # R5 review lock: same trace + same name + same timestamp must
        # still yield distinct child span ids (ordinal-hashed)
        spans = event_traces_to_spans([
            {"traceId": self.CORR, "timestampNanos": 7, "name": "p"},
            {"traceId": self.CORR, "timestampNanos": 7, "name": "p"},
            {"traceId": self.CORR, "timestampNanos": 7, "name": "p"},
        ])
        ids = [s["spanId"] for s in spans]
        assert len(set(ids)) == 3

    def test_seen_traces_bounded(self):
        from pincette_json_streams_spark.streaming.otlp import SeenTraces

        seen = SeenTraces(maxsize=10)
        for i in range(50):
            seen.root(f"{i:032x}")
        assert len(seen._d) == 10  # LRU-evicted, no unbounded growth

    def test_exporter_ships_spans(self):
        exp, rec = _exporter()
        exp.emit_event_trace(
            {"traceId": self.CORR, "timestampNanos": 5, "name": "p.out",
             "attributes": {"application": "my-app"},
             "username": "bob"})
        exp.flush()
        url, body, _ = rec.posts[0]
        assert url == "http://collector:4318/v1/traces"
        span = body["resourceSpans"][0]["scopeSpans"][0]["spans"][0]
        attrs = {a["key"]: a["value"] for a in span["attributes"]}
        assert attrs["username"] == {"stringValue": "bob"}
        assert span["kind"] == 1


class TestBestEffortShipping:
    """R5 review locks: telemetry must never raise into the pipeline."""

    def test_connection_failure_does_not_raise(self):
        def exploding(url, body, headers):
            raise OSError("collector down")

        exp = OtlpHttpExporter("http://c:4318", poster=exploding,
                               batch_size=1)
        exp.log_emitter({"logger": "a", "level": "INFO", "message": "x"})
        assert exp.dropped == 1  # counted, not raised

    def test_http_error_counts_dropped(self):
        exp = OtlpHttpExporter("http://c:4318",
                               poster=lambda *a: 503, batch_size=2)
        exp.log_emitter({"logger": "a", "level": "INFO", "message": "1"})
        exp.log_emitter({"logger": "a", "level": "INFO", "message": "2"})
        assert exp.dropped == 2

    def test_default_poster_refuses_to_raise(self):
        from pincette_json_streams_spark.streaming.otlp import (
            _urllib_post,
        )
        # unreachable port: URLError path must return -1, not raise
        assert _urllib_post("http://127.0.0.1:9/v1/logs", b"{}",
                            {"Content-Type": "application/json"}) == -1

    def test_close_flushes_tail(self):
        rec = _Recorder()
        exp = OtlpHttpExporter("http://c:4318", poster=rec,
                               batch_size=100)
        exp.log_emitter({"logger": "a", "level": "INFO", "message": "t"})
        assert rec.posts == []
        exp.close()
        assert len(rec.posts) == 1


class TestActivation:
    def test_off_when_unset(self):
        assert exporter_from_config({}) is None
        assert exporter_from_config(None) is None

    def test_http_nested_and_flat(self):
        e1 = exporter_from_config({"otlp": {"http": "http://c:4318"}},
                                  application="app1")
        assert e1.endpoint == "http://c:4318"
        assert e1.service_name == "app1"
        e2 = exporter_from_config({"otlp.http": "http://c:4318",
                                   "namespace": "prod"})
        assert e2.namespace == "prod"

    def test_grpc_only_raises(self):
        with pytest.raises(ValueError, match="otlp.http"):
            exporter_from_config({"otlp": {"grpc": "http://c:4317"}})


class TestConfigureTelemetry:
    def test_wires_emitters_without_clobbering(self):
        from pincette_json_streams_spark.operators.stages import (
            PipelineContext,
        )
        from pincette_json_streams_spark.streaming.otlp import (
            configure_telemetry,
        )
        pctx = PipelineContext()
        exp = configure_telemetry(
            pctx, {"otlp": {"http": "http://c:4318"},
                   "traceSamplePercentage": 25},
            application="app1")
        assert pctx.log_emitter == exp.log_emitter
        assert pctx.probe_producer == exp.probe_producer
        assert pctx.trace_sample_pct == 25
        # explicitly injected emitters win
        marker = lambda r: None  # noqa: E731
        pctx2 = PipelineContext(log_emitter=marker)
        configure_telemetry(pctx2, {"otlp.http": "http://c:4318"})
        assert pctx2.log_emitter is marker

    def test_telemetry_off_is_noop(self):
        from pincette_json_streams_spark.operators.stages import (
            PipelineContext,
        )
        from pincette_json_streams_spark.streaming.otlp import (
            configure_telemetry,
        )
        pctx = PipelineContext()
        assert configure_telemetry(pctx, {}) is None
        assert pctx.log_emitter is None


class TestReviewRegressionsR5c:
    def test_trace_sample_default_is_ten(self):
        from pincette_json_streams_spark.operators.stages import (
            PipelineContext,
        )
        from pincette_json_streams_spark.streaming.otlp import (
            configure_telemetry,
        )
        pctx = PipelineContext()
        configure_telemetry(pctx, {"otlp.http": "http://c:4318"})
        assert pctx.trace_sample_pct == 10  # reference default
        pctx2 = PipelineContext()
        configure_telemetry(pctx2, {"otlp.http": "http://c:4318",
                                    "traceSamplePercentage": 0})
        assert pctx2.trace_sample_pct == 0
