"""OTLP/HTTP telemetry export.

Reference behavior (docs/telemetry.md:3): logs and metrics are emitted
directly over OpenTelemetry when the ``otlp.http`` / ``otlp.grpc``
configuration entries are set (docs/configuration.md:28-29); distributed
traces are indirect — flat *event traces* go to a Kafka ``tracesTopic``
(docs/telemetry.md:54-66) and a small consumer application turns them
into OTLP spans (docs/telemetry.md:68: first occurrence of a trace id
becomes the root span, its span id is the first half of the trace id,
every later event trace becomes a child; all spans last one
microsecond).

Spark-first mapping: the engine's ``$log``/``$probe`` stages already
emit OTEL-shaped records through the injectable ``pctx.log_emitter`` /
``pctx.probe_producer`` seams.  This module provides the missing
shipping leg as plain stdlib code:

- :class:`OtlpHttpExporter` — batched OTLP/HTTP **JSON** emitter
  (``/v1/logs``, ``/v1/metrics``, ``/v1/traces``) over urllib; the
  poster is injectable so tests assert the envelope offline.  Only the
  HTTP binding is implemented — ``otlp.grpc`` needs the grpc wheel and
  raises a clear error instead of silently downgrading.
- :func:`event_trace_record` — the reference's event-trace JSON shape
  (docs/telemetry.md:56-66) from a message + part context.
- :func:`event_traces_to_spans` — the traces-application conversion
  (docs/telemetry.md:68), usable inside ``foreachBatch`` on the
  ``tracesTopic`` stream.
- :func:`exporter_from_config` — activation from the reference's
  configuration shape (``otlp.http`` entry).

Executor-side usage: hand ``exporter.log_emitter`` to
``PipelineContext.log_emitter`` — the exporter buffers per process,
flushes at ``batch_size`` and on ``close()``/garbage collection.
Telemetry is BEST-EFFORT by contract: a collector outage never raises
into the data pipeline — failed batches are counted in
``exporter.dropped`` and discarded (bounded memory, no retry queue).
Root-span state is bounded (``SeenTraces(maxsize)``, LRU eviction): an
event arriving after its trace id was evicted starts a fresh root span
— the standard trade-off of the reference's traces app pattern.
"""

from __future__ import annotations

import json
import time
import uuid
from typing import Callable, Iterable, Optional

__all__ = [
    "OtlpHttpExporter", "event_trace_record", "event_traces_to_spans",
    "exporter_from_config", "configure_telemetry",
    "FRAME_TYPE", "FRAME_VERSION",
    "SeenTraces",
]

FRAME_TYPE = "json-streams"
FRAME_VERSION = "spark-1.0"

# java.util.logging level name -> OTLP severityNumber (spec: TRACE=1,
# DEBUG=5, INFO=9, WARN=13, ERROR=17)
_SEVERITY = {
    "FINEST": 1, "FINER": 5, "FINE": 5, "CONFIG": 9, "INFO": 9,
    "WARNING": 13, "SEVERE": 17,
}


def _attr_value(v):
    """JSON value -> OTLP AnyValue."""
    if isinstance(v, bool):
        return {"boolValue": v}
    if isinstance(v, int):
        return {"intValue": str(v)}
    if isinstance(v, float):
        return {"doubleValue": v}
    if isinstance(v, (dict, list)):
        return {"stringValue": json.dumps(v, default=str)}
    return {"stringValue": "" if v is None else str(v)}


def _attrs(d: Optional[dict]) -> list:
    return [{"key": str(k), "value": _attr_value(v)}
            for k, v in (d or {}).items()]


def _urllib_post(url: str, body: bytes, headers: dict) -> int:
    import urllib.error
    import urllib.request

    req = urllib.request.Request(url, method="POST", data=body,
                                 headers=headers)
    try:
        with urllib.request.urlopen(req, timeout=10) as resp:
            return resp.status
    except urllib.error.HTTPError as e:
        return e.code
    except Exception:
        # connection-level failure (collector down, DNS, timeout):
        # telemetry must never raise into the data pipeline
        return -1


class SeenTraces:
    """Bounded root-span state: trace id -> children seen so far.
    LRU-evicted at ``maxsize`` so a long-running traces consumer can't
    leak; an evicted trace's late event becomes a fresh root."""

    def __init__(self, maxsize: int = 100_000):
        from collections import OrderedDict

        self.maxsize = maxsize
        self._d: "OrderedDict[str, int]" = OrderedDict()

    def __contains__(self, tid: str) -> bool:
        return tid in self._d

    def root(self, tid: str) -> None:
        self._d[tid] = 0
        self._d.move_to_end(tid)
        while len(self._d) > self.maxsize:
            self._d.popitem(last=False)

    def next_child(self, tid: str) -> int:
        self._d[tid] += 1
        self._d.move_to_end(tid)
        return self._d[tid]


class OtlpHttpExporter:
    """Batched OTLP/HTTP JSON emitter (stdlib urllib).

    ``endpoint`` is the collector base URL (e.g. ``http://host:4318``,
    docs/configuration.md:29); signals POST to ``/v1/logs``,
    ``/v1/metrics`` and ``/v1/traces``.  ``poster(url, body, headers)
    -> status`` is injectable for offline tests.  Records buffer until
    ``batch_size`` then flush; call :meth:`flush` at batch/stream-epoch
    boundaries for the tail."""

    def __init__(
        self,
        endpoint: str,
        service_name: str = FRAME_TYPE,
        namespace: str = FRAME_TYPE,
        service_version: Optional[str] = None,
        headers: Optional[dict] = None,
        batch_size: int = 100,
        poster: Optional[Callable[[str, bytes, dict], int]] = None,
    ):
        self.endpoint = endpoint.rstrip("/")
        self.service_name = service_name
        self.namespace = namespace
        self.service_version = service_version
        self.headers = {"Content-Type": "application/json",
                        **(headers or {})}
        self.batch_size = int(batch_size)
        self.poster = poster or _urllib_post
        self._logs: list = []
        self._metrics: list = []
        self._spans: list = []
        self._seen_traces = SeenTraces()
        self.dropped = 0  # records lost to failed POSTs (best-effort)

    # -- resource -----------------------------------------------------------
    def _resource(self) -> dict:
        attrs = {
            "service.name": self.service_name,
            "service.namespace": self.namespace,
        }
        if self.service_version:
            attrs["service.version"] = self.service_version
        return {"attributes": _attrs(attrs)}

    # -- logs ---------------------------------------------------------------
    def log_emitter(self, record: dict) -> None:
        """``pctx.log_emitter``-compatible: accepts the engine's $log
        record shape (logger/level/message/attributes/trace_id/span_id,
        streaming/effects.py stage_log) and buffers an OTLP logRecord."""
        level = record.get("level") or "INFO"
        lr = {
            "timeUnixNano": str(record.get("time_unix_nano")
                                or time.time_ns()),
            "severityNumber": _SEVERITY.get(level, 9),
            "severityText": level,
            "body": {"stringValue": record.get("message") or ""},
            "attributes": _attrs({
                "logger": record.get("logger"),
                **(record.get("attributes") or {}),
            }),
        }
        if record.get("trace_id"):
            lr["traceId"] = record["trace_id"]
        if record.get("span_id"):
            lr["spanId"] = record["span_id"]
        self._logs.append(lr)
        if len(self._logs) >= self.batch_size:
            self.flush()

    # -- metrics ------------------------------------------------------------
    def emit_counter(self, name: str, value: int,
                     attributes: Optional[dict] = None,
                     time_unix_nano: Optional[int] = None) -> None:
        """A monotonic counter data point — the reference's
        ``json_streams.messages`` per-part counters (docs/telemetry.md:
        35-47) map here with the same attribute set."""
        self._metrics.append({
            "name": name,
            "sum": {
                "aggregationTemporality": 2,  # CUMULATIVE
                "isMonotonic": True,
                "dataPoints": [{
                    "asInt": str(int(value)),
                    "timeUnixNano": str(time_unix_nano or time.time_ns()),
                    "attributes": _attrs(attributes),
                }],
            },
        })
        if len(self._metrics) >= self.batch_size:
            self.flush()

    def probe_producer(self, rec: dict) -> None:
        """``pctx.probe_producer``-compatible: ship a $probe counter
        record {name, minute, count, topic} as a counter point."""
        self.emit_counter(
            "json_streams.messages", rec.get("count", 0),
            attributes={"part": rec.get("name"),
                        "topic": rec.get("topic")},
            time_unix_nano=int(rec.get("minute", 0)) * 1_000_000_000
            or None,
        )

    # -- traces -------------------------------------------------------------
    def emit_event_trace(self, record: dict) -> None:
        """Consume one reference-shaped event trace
        (docs/telemetry.md:56-66) and buffer its OTLP span, applying
        the traces-application convention (docs/telemetry.md:68)."""
        span = _span_from_event(record, self._seen_traces)
        if span is not None:
            self._spans.append(span)
            if len(self._spans) >= self.batch_size:
                self.flush()

    # -- shipping -----------------------------------------------------------
    def _post(self, path: str, payload: dict, n_records: int) -> int:
        try:
            status = self.poster(self.endpoint + path,
                                 json.dumps(payload).encode(),
                                 self.headers)
        except Exception:
            status = -1  # injected poster misbehaving: still no raise
        if not 200 <= status < 300:
            self.dropped += n_records
        return status

    def flush(self) -> None:
        if self._logs:
            logs, self._logs = self._logs, []
            self._post("/v1/logs", {"resourceLogs": [{
                "resource": self._resource(),
                "scopeLogs": [{"scope": {"name": FRAME_TYPE},
                               "logRecords": logs}],
            }]}, len(logs))
        if self._metrics:
            metrics, self._metrics = self._metrics, []
            self._post("/v1/metrics", {"resourceMetrics": [{
                "resource": self._resource(),
                "scopeMetrics": [{"scope": {"name": FRAME_TYPE},
                                  "metrics": metrics}],
            }]}, len(metrics))
        if self._spans:
            spans, self._spans = self._spans, []
            self._post("/v1/traces", {"resourceSpans": [{
                "resource": self._resource(),
                "scopeSpans": [{"scope": {"name": FRAME_TYPE},
                                "spans": spans}],
            }]}, len(spans))

    def close(self) -> None:
        self.flush()

    def __del__(self):  # pragma: no cover - GC timing
        try:
            self.flush()
        except Exception:
            pass


def event_trace_record(
    message: dict,
    application: str,
    part: str,
    name: str,
    namespace: str = FRAME_TYPE,
    version: Optional[str] = None,
    payload: Optional[dict] = None,
    timestamp_nanos: Optional[int] = None,
) -> Optional[dict]:
    """The reference's event-trace JSON (docs/telemetry.md:56-66).
    Returns None when the message has no ``_corr`` UUID — the reference
    only traces correlated messages."""
    corr = message.get("_corr")
    if not corr:
        return None
    try:
        uuid.UUID(str(corr))
    except ValueError:
        return None
    jwt = message.get("_jwt")
    rec = {
        "attributes": {
            "application": application,
            "part": part,
            "profile.frame.type": FRAME_TYPE,
            "profile.frame.version": FRAME_VERSION,
        },
        "name": name,
        "payload": payload or {},
        "serviceNamespace": namespace,
        "serviceName": application,
        "serviceVersion": version or "",
        "timestampNanos": int(timestamp_nanos or time.time_ns()),
        "traceId": str(corr),
    }
    if isinstance(jwt, dict) and jwt.get("sub"):
        rec["username"] = jwt["sub"]
    return rec


def _span_from_event(record: dict, seen: SeenTraces) -> Optional[dict]:
    """One event trace -> one OTLP span (docs/telemetry.md:68): trace id
    = the UUID with dashes removed; the FIRST event of a trace becomes
    the root span with span id = the first half of the trace id; later
    events become its children.  Child span ids hash the trace's child
    ORDINAL (not timestamp+name, which collide for batch-stamped events
    of one part).  Every span lasts exactly one microsecond."""
    tid = str(record.get("traceId", "")).replace("-", "").lower()
    if len(tid) != 32:
        return None
    ts = int(record.get("timestampNanos") or time.time_ns())
    root_span = tid[:16]
    attributes = dict(record.get("attributes") or {})
    if record.get("username"):
        attributes["username"] = record["username"]
    if record.get("payload"):
        attributes["payload"] = record["payload"]
    span = {
        "traceId": tid,
        "name": record.get("name") or "event",
        "kind": 1,  # INTERNAL
        "startTimeUnixNano": str(ts),
        "endTimeUnixNano": str(ts + 1_000),  # one microsecond
        "attributes": _attrs(attributes),
    }
    if tid not in seen:
        seen.root(tid)
        span["spanId"] = root_span
    else:
        import hashlib

        span["spanId"] = hashlib.md5(
            f"{tid}:{seen.next_child(tid)}".encode()
        ).hexdigest()[:16]
        span["parentSpanId"] = root_span
    return span


def event_traces_to_spans(
    records: Iterable[dict], seen: Optional[SeenTraces] = None
) -> list[dict]:
    """Batch form of the traces-application conversion — feed it the
    decoded rows of a ``tracesTopic`` micro-batch inside
    ``foreachBatch``; pass one ``SeenTraces`` across batches so root
    spans stay stable (bounded, LRU-evicted)."""
    seen = seen if seen is not None else SeenTraces()
    out = []
    for r in records:
        s = _span_from_event(r, seen)
        if s is not None:
            out.append(s)
    return out


def exporter_from_config(
    config: dict,
    application: Optional[str] = None,
    poster: Optional[Callable[[str, bytes, dict], int]] = None,
) -> Optional[OtlpHttpExporter]:
    """Activation from the reference configuration shape: returns an
    exporter when ``otlp.http`` is set (docs/configuration.md:29),
    None when telemetry is off.  ``otlp.grpc`` alone raises — the grpc
    binding needs wheels this runtime does not carry, and silently
    dropping telemetry would be worse than failing the build."""
    otlp = (config or {}).get("otlp") or {}
    # HOCON-flat form too: {"otlp.http": "..."}
    http = otlp.get("http") or (config or {}).get("otlp.http")
    grpc = otlp.get("grpc") or (config or {}).get("otlp.grpc")
    if not http:
        if grpc:
            raise ValueError(
                "otlp.grpc is configured but only the OTLP/HTTP JSON "
                "binding is implemented — set otlp.http")
        return None
    return OtlpHttpExporter(
        http,
        service_name=application or FRAME_TYPE,
        namespace=(config or {}).get("namespace", FRAME_TYPE),
        poster=poster,
    )


def configure_telemetry(pctx, config: Optional[dict],
                        application: Optional[str] = None):
    """Reference-shaped activation in one call: ``otlp.http`` wires the
    exporter into ``pctx.log_emitter`` / ``pctx.probe_producer``
    (without clobbering explicitly injected ones) and
    ``traceSamplePercentage`` (docs/configuration.md, default 10) sets
    the deterministic trace sampling.  Returns the exporter or None.
    ``tracesTopic`` PRODUCTION needs a Kafka producer — inject
    ``pctx.trace_producer`` separately (the planner emits one event
    trace per correlated message at each part output once it is set)."""
    exp = exporter_from_config(config, application=application)
    if exp is not None:
        if getattr(pctx, "log_emitter", None) is None:
            pctx.log_emitter = exp.log_emitter
        if getattr(pctx, "probe_producer", None) is None:
            pctx.probe_producer = exp.probe_producer
    # reference default is 10 (docs/configuration.md:32) — applying it
    # here keeps mixed deployments sampling the SAME traces; 0 turns
    # tracing off entirely
    pct = (config or {}).get("traceSamplePercentage")
    pctx.trace_sample_pct = int(pct) if pct is not None else 10
    return exp
