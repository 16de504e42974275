"""Side-effect stage tests: $http/$signJwt/$send/$delay/$delete/$s3*
(reference spec /root/reference/docs/aggregation_stages.md:118-244,
550-639, 641-785).  All offline: fake HTTP transport + local object
store."""

import json

import pytest
from pyspark.sql import functions as F

from pincette_json_streams_spark.operators.stages import (
    PipelineContext,
    compile_pipeline,
)
from pincette_json_streams_spark.streaming.effects import (
    HttpResponse,
    LocalObjectStore,
)


def _make_fake_http():
    # closure, not a module-level function: cloudpickle ships it by VALUE,
    # so Spark workers don't need the tests package on their path
    def fake_http(method, url, headers, body):
        import json as _json

        if url.endswith("/fail"):
            return HttpResponse(503, '"unavailable"')
        if url.endswith("/list"):
            return HttpResponse(200, _json.dumps([{"n": 1}, {"n": 2}]))
        try:
            echo = _json.loads(body) if body else None
        except ValueError:
            echo = {"raw_len": len(body)}  # non-JSON (e.g. multipart)
        return HttpResponse(
            200,
            _json.dumps({"method": method, "url": url, "echo": echo,
                         "auth": headers.get("Authorization")}),
        )
    return fake_http


@pytest.fixture()
def pctx(tmp_path):
    return PipelineContext(
        http_transport=_make_fake_http(),
        object_store=LocalObjectStore(str(tmp_path)),
    )


class TestHttp:
    def test_get_with_as(self, people, pctx):
        out = compile_pipeline(people.filter("_id='p1'"), [
            {"$http": {"url": {"$concat": ["http://svc/", "$_id"]},
                       "method": "GET", "as": "result"}},
        ], pctx).collect()
        body = json.loads(out[0]["result"])
        assert body["url"] == "http://svc/p1"
        assert out[0]["httpError"] is None

    def test_post_body_headers(self, people, pctx):
        out = compile_pipeline(people.filter("_id='p2'"), [
            {"$http": {"url": "http://svc/post", "method": "POST",
                       "headers": {"Authorization": "Bearer tok"},
                       "body": {"name": "$name"},
                       "as": "r"}},
        ], pctx).collect()
        body = json.loads(out[0]["r"])
        assert body["echo"] == {"name": "Bob"}
        assert body["auth"] == "Bearer tok"

    def test_error_captured(self, people, pctx):
        out = compile_pipeline(people, [
            {"$http": {"url": "http://svc/fail", "method": "GET",
                       "as": "r"}},
            {"$match": {"httpError.statusCode": 503}},
        ], pctx)
        assert out.count() == 4
        assert out.collect()[0]["r"] is None

    def test_unwind(self, people, pctx):
        out = compile_pipeline(people.filter("_id='p1'"), [
            {"$http": {"url": "http://svc/list", "method": "GET",
                       "as": "item", "unwind": True}},
        ], pctx).collect()
        assert [json.loads(r["item"])["n"] for r in out] == [1, 2]


class TestSignJwt:
    def test_rs256_roundtrip(self, people, pctx):
        from cryptography.hazmat.primitives import serialization
        from cryptography.hazmat.primitives.asymmetric import rsa

        key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
        pem = key.private_bytes(
            serialization.Encoding.PEM,
            serialization.PrivateFormat.PKCS8,
            serialization.NoEncryption(),
        ).decode()

        out = compile_pipeline(people.filter("_id='p1'"), [
            {"$signJwt": {"privateKey": pem, "as": "_token", "ttl": 60,
                          "sub": "$name", "iss": "tests",
                          "claims": {"roles": ["admin"]}}},
        ], PipelineContext()).collect()
        token = out[0]["_token"]
        header, payload, sig = token.split(".")
        import base64

        def dec(part):
            return json.loads(base64.urlsafe_b64decode(part + "=="))

        assert dec(header)["alg"] == "RS256"
        claims = dec(payload)
        assert claims["sub"] == "Alice" and claims["iss"] == "tests"
        assert claims["roles"] == ["admin"]
        assert claims["exp"] - claims["iat"] == 60
        # signature verifies against the public key
        from cryptography.hazmat.primitives import hashes
        from cryptography.hazmat.primitives.asymmetric import padding

        key.public_key().verify(
            base64.urlsafe_b64decode(sig + "=="),
            f"{header}.{payload}".encode(),
            padding.PKCS1v15(), hashes.SHA256(),
        )

    def test_sign_jwt_cache_distinct_keys(self):
        """Two different private keys with identical claims must not share
        a cached token (PEMs agree on their first 64 chars)."""
        from cryptography.hazmat.primitives import serialization
        from cryptography.hazmat.primitives.asymmetric import rsa

        from pincette_json_streams_spark.streaming.effects import (
            _sign_rs256,
        )

        def pem():
            k = rsa.generate_private_key(
                public_exponent=65537, key_size=2048
            )
            return k.private_bytes(
                serialization.Encoding.PEM,
                serialization.PrivateFormat.PKCS8,
                serialization.NoEncryption(),
            ).decode()

        # find two keys agreeing on their first 64 chars (the old cache
        # key); the DER length byte varies, so sample a few
        by_prefix = {}
        a = b = None
        for _ in range(12):
            p = pem()
            other = by_prefix.setdefault(p[:64], p)
            if other != p:
                a, b = other, p
                break
        if a is None:
            a, b = pem(), pem()  # still verifies distinct-key tokens
        claims = {"sub": "alice"}
        ta = _sign_rs256(a, claims, 60, None)
        tb = _sign_rs256(b, claims, 60, None)
        assert ta != tb
        assert ta.rsplit(".", 1)[1] != tb.rsplit(".", 1)[1]


class TestSendDelay:
    def test_send_routes_and_passes_through(self, people, pctx):
        out = compile_pipeline(people, [
            {"$send": {"topic": {"$concat": ["t-", "$name"]}}},
        ], pctx)
        assert out.count() == 4  # pass-through
        assert len(pctx.sends) == 1
        routed = pctx.sends[0]
        assert sorted(r["topic"] for r in routed.select("topic")
                      .collect()) == ["t-Alice", "t-Bob", "t-Carol",
                                      "t-Dave"]

    def test_delay_adds_deliver_after(self, people, pctx):
        compile_pipeline(people, [
            {"$delay": {"duration": 5000, "topic": "retry"}},
        ], pctx)
        routed = pctx.sends[0].collect()
        import time
        now_ms = time.time() * 1000
        assert all(r["topic"] == "retry" for r in routed)
        assert all(r["deliver_after"] >= now_ms + 4000 for r in routed)


def _make_spool_emitter(path):
    # file-backed spool: mapInPandas runs in Python worker processes, so
    # an in-memory list in the test process would never see the records
    def emit(record):
        import json as _json
        with open(path, "a") as f:
            f.write(_json.dumps(record) + "\n")
    return emit


class TestLog:
    def _records(self, path):
        with open(path) as f:
            return [json.loads(line) for line in f]

    def test_log_emits_and_passes_through(self, spark, tmp_path):
        spool = str(tmp_path / "log.jsonl")
        pctx = PipelineContext(
            log_emitter=_make_spool_emitter(spool), app_name="my-app"
        )
        df = spark.createDataFrame(
            [("d1", "hello", "6f1c9f0e-2a51-4b2e-9c3d-aabbccddeeff"),
             ("d2", "world", None)],
            "_id string, txt string, _corr string",
        ).coalesce(1)
        out = compile_pipeline(df, [
            {"$log": {"message": "$txt", "level": "WARNING",
                      "attributes": {"dataset": "test",
                                     "id": "$_id"}}},
        ], pctx)
        rows = out.collect()  # triggers emission
        assert sorted(r["_id"] for r in rows) == ["d1", "d2"]
        assert out.columns == df.columns  # schema unchanged
        recs = {r["message"]: r for r in self._records(spool)}
        assert set(recs) == {"hello", "world"}
        r1 = recs["hello"]
        assert r1["logger"] == "my-app"
        assert r1["level"] == "WARNING"
        assert r1["attributes"] == {"dataset": "test", "id": "d1"}
        # _corr -> trace id without dashes; span = first half
        assert r1["trace_id"] == "6f1c9f0e2a514b2e9c3daabbccddeeff"
        assert r1["span_id"] == "6f1c9f0e2a514b2e"
        r2 = recs["world"]
        assert r2["trace_id"] is None and r2["span_id"] is None

    def test_log_non_string_message_serialized(self, spark, tmp_path):
        spool = str(tmp_path / "log.jsonl")
        pctx = PipelineContext(log_emitter=_make_spool_emitter(spool))
        df = spark.createDataFrame([("d1", 7)], "_id string, n int") \
            .coalesce(1)
        compile_pipeline(df, [
            {"$log": {"message": {"doc": "$_id", "n": "$n"}}},
        ], pctx).collect()
        (rec,) = self._records(spool)
        assert json.loads(rec["message"]) == {"doc": "d1", "n": 7}
        assert rec["level"] == "INFO"  # default

    def test_probe_counts_to_topic(self, spark, tmp_path):
        """$probe with a topic: per-minute {name, minute, count} records
        reach the producer; counts sum to the row count (per-task
        counting is the reference's documented contract); flow passes
        through unchanged."""
        spool = str(tmp_path / "probe.jsonl")
        pctx = PipelineContext(probe_producer=_make_spool_emitter(spool))
        df = spark.range(0, 100).selectExpr("CAST(id AS STRING) AS _id")
        out = compile_pipeline(df, [
            {"$probe": {"name": "filtering", "topic": "probe-part"}},
        ], pctx)
        assert out.count() == 100  # pass-through
        recs = self._records(spool)
        assert all(r["name"] == "filtering" and r["topic"] == "probe-part"
                   for r in recs)
        assert sum(r["count"] for r in recs) == 100
        assert all(r["minute"] % 60 == 0 for r in recs)

    def test_log_without_message_logs_spec_once(self, spark, tmp_path):
        spool = str(tmp_path / "log.jsonl")
        pctx = PipelineContext(log_emitter=_make_spool_emitter(spool))
        df = spark.createDataFrame([("d1",)], "_id string")
        out = compile_pipeline(df, [{"$log": "just-a-string"}], pctx)
        assert out.count() == 1  # pass-through
        (rec,) = self._records(spool)
        assert rec["message"] == '"just-a-string"'


class TestDelete:
    def test_delete_from_collection(self, spark, people, pctx):
        coll = spark.createDataFrame(
            [("x1", "Alice"), ("x2", "Bob"), ("x3", "Zoe")],
            "rec string, name string",
        )
        pctx.catalog["mycoll"] = coll
        out = compile_pipeline(people, [
            {"$delete": {"from": "mycoll", "on": "name"}},
        ], pctx)
        assert out.count() == 4  # pass-through
        remaining = pctx.catalog["mycoll"].collect()
        assert [r["name"] for r in remaining] == ["Zoe"]


class TestS3:
    def test_s3_out_and_csv_roundtrip(self, spark, pctx):
        msgs = spark.createDataFrame(
            [("m1", "b", "data/one.json")], "_id string, bkt string, "
            "k string")
        compile_pipeline(msgs, [
            {"$s3Out": {"bucket": "$bkt", "key": "$k"}},
        ], pctx).count()
        stored = json.loads(pctx.object_store.read("b", "data/one.json"))
        assert stored["_id"] == "m1"

        # $s3Csv: emit one message per line with header fields + long/
        # double/string inference (S3CsvStage.java:246-251)
        pctx.object_store.write(
            "b", "t.csv", b"id\tqty\tprice\tname\n1\t5\t9.5\twidget\n"
            b"2\t6\t8.25\tgadget\n")
        ev = spark.createDataFrame([("e1", "b", "t.csv")],
                                   "_id string, bucket string, key string")
        out = compile_pipeline(ev, [
            {"$s3Csv": {"bucket": "$bucket", "key": "$key",
                        "separator": "\t"}},
        ], pctx).collect()
        docs = [json.loads(r["value"]) for r in out]
        assert docs[0] == {"id": 1, "qty": 5, "price": 9.5,
                           "name": "widget"}
        assert isinstance(docs[1]["qty"], int)

    def test_s3_transfer(self, spark, pctx):
        msgs = spark.createDataFrame([("m1",)], "_id string")
        out = compile_pipeline(msgs, [
            {"$s3Transfer": {"url": "http://svc/obj", "bucket": "b2",
                             "key": "fetched.json", "as": "loc"}},
        ], pctx).collect()
        assert out[0]["loc"] == "s3://b2/fetched.json"
        assert pctx.object_store.read("b2", "fetched.json")

    def test_s3_attachments_binary_exact(self, spark, tmp_path):
        """Bytes >= 0x80 must reach the transport unexpanded (a UTF-8
        re-encode would double them and corrupt Content-Length).  The
        transport reports what it saw through the httpError body."""
        def measuring_http(method, url, headers, body):
            raw = body if isinstance(body, bytes) else body.encode()
            return HttpResponse(400, str(len(raw)))

        pctx = PipelineContext(
            http_transport=measuring_http,
            object_store=LocalObjectStore(str(tmp_path)),
        )
        payload = bytes(range(256)) * 4
        pctx.object_store.write("b", "bin.dat", payload)
        msgs = spark.createDataFrame([("m1",)], "_id string")
        out = compile_pipeline(msgs, [
            {"$s3Attachments": {
                "url": "http://svc/post",
                "attachments": {"$literal": [
                    {"bucket": "b", "key": "bin.dat"},
                ]},
            }},
        ], pctx).collect()
        boundary = "pjs-boundary"
        head = (f"--{boundary}\r\nContent-Length: {len(payload)}\r\n"
                "Content-Transfer-Encoding: binary\r\n\r\n")
        expected_len = (len(head.encode()) + len(payload) + 2
                        + len(f"--{boundary}--\r\n"))
        assert int(out[0]["httpError"]["body"]) == expected_len

    def test_s3_attachments(self, spark, pctx):
        pctx.object_store.write("b", "a1.txt", b"hello")
        pctx.object_store.write("b", "a2.txt", b"world")
        msgs = spark.createDataFrame([("m1",)], "_id string")
        out = compile_pipeline(msgs, [
            {"$s3Attachments": {
                "url": "http://svc/post",
                "attachments": {"$literal": [
                    {"bucket": "b", "key": "a1.txt",
                     "x-my-header": "v"},
                    {"bucket": "b", "key": "a2.txt"},
                ]},
            }},
        ], pctx).collect()
        assert out[0]["httpError"] is None


def _make_pkcs12(tmp_path, password=b"secret", name="client"):
    """Self-signed key+cert bundled as PKCS#12 (the sslContext keyStore
    shape, reference docs/aggregation_stages.md:217)."""
    import datetime

    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.hazmat.primitives.serialization import pkcs12
    from cryptography.x509.oid import NameOID

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    subject = x509.Name(
        [x509.NameAttribute(NameOID.COMMON_NAME, name)])
    now = datetime.datetime.now(datetime.timezone.utc)
    cert = (
        x509.CertificateBuilder()
        .subject_name(subject).issuer_name(subject)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now - datetime.timedelta(minutes=5))
        .not_valid_after(now + datetime.timedelta(days=1))
        .add_extension(x509.SubjectAlternativeName(
            [x509.DNSName("localhost")]), critical=False)
        .sign(key, hashes.SHA256())
    )
    p12 = pkcs12.serialize_key_and_certificates(
        name.encode(), key, cert, None,
        serialization.BestAvailableEncryption(password)
        if password else serialization.NoEncryption())
    path = tmp_path / f"{name}.p12"
    path.write_bytes(p12)
    pem_cert = tmp_path / f"{name}-cert.pem"
    pem_cert.write_bytes(cert.public_bytes(serialization.Encoding.PEM))
    pem_key = tmp_path / f"{name}-key.pem"
    pem_key.write_bytes(key.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.PKCS8,
        serialization.NoEncryption()))
    return str(path), str(pem_cert), str(pem_key)


class TestSslContext:
    def test_stage_passes_built_context_to_transport(
            self, spark, people, tmp_path):
        # the wiring contract: sslContext {keyStore, password} reaches
        # the transport as a real ssl.SSLContext built from the PKCS#12
        p12, _, _ = _make_pkcs12(tmp_path)

        def recording(method, url, headers, body, ssl_context=None):
            import ssl as _ssl
            ok = isinstance(ssl_context, _ssl.SSLContext)
            return HttpResponse(200 if ok else 500, '"x"')

        pctx = PipelineContext(http_transport=recording)
        out = compile_pipeline(people.filter("_id='p1'"), [
            {"$http": {"url": "https://svc/x", "method": "GET", "as": "r",
                       "sslContext": {"keyStore": p12,
                                      "password": "secret"}}},
        ], pctx).collect()
        assert out[0]["httpError"] is None

    def test_transport_without_ssl_support_rejected_at_compile(
            self, spark, people, tmp_path):
        p12, _, _ = _make_pkcs12(tmp_path)

        def no_ssl(method, url, headers, body):
            return HttpResponse(200, '"x"')

        pctx = PipelineContext(http_transport=no_ssl)
        with pytest.raises(ValueError, match="ssl_context"):
            compile_pipeline(people, [
                {"$http": {"url": "https://svc/x", "method": "GET",
                           "sslContext": {"keyStore": p12,
                                          "password": "secret"}}},
            ], pctx)

    def test_bad_keystore_becomes_http_error(self, spark, people):
        # executor-side failure (missing file) -> httpError, not a crash
        pctx = PipelineContext()
        out = compile_pipeline(people.filter("_id='p1'"), [
            {"$http": {"url": "https://svc/x", "method": "GET", "as": "r",
                       "sslContext": {"keyStore": "/nonexistent.p12",
                                      "password": "x"}}},
        ], pctx).collect()
        assert out[0]["httpError"]["statusCode"] == -1

    def test_real_mtls_handshake_loopback(self, tmp_path):
        # END-TO-END: an https server REQUIRING a client certificate;
        # build_ssl_context(keyStore, password) + urllib_transport must
        # complete the handshake, and a contextless call must fail
        import http.server
        import ssl
        import threading

        from pincette_json_streams_spark.streaming.effects import (
            build_ssl_context, urllib_transport,
        )

        p12, client_cert, _ = _make_pkcs12(tmp_path, name="client")
        _, server_cert, server_key = _make_pkcs12(
            tmp_path, password=b"srv", name="server")

        class H(http.server.BaseHTTPRequestHandler):
            def do_GET(self):
                self.send_response(200)
                self.send_header("Content-Length", "4")
                self.end_headers()
                self.wfile.write(b'"ok"')

            def log_message(self, *a):
                pass

        srv_ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        srv_ctx.load_cert_chain(server_cert, server_key)
        srv_ctx.load_verify_locations(client_cert)
        srv_ctx.verify_mode = ssl.CERT_REQUIRED
        httpd = http.server.HTTPServer(("127.0.0.1", 0), H)
        httpd.socket = srv_ctx.wrap_socket(httpd.socket, server_side=True)
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            ctx = build_ssl_context(p12, "secret")
            # trust the self-signed server cert (test-only; production
            # servers chain to the default trust store)
            ctx.load_verify_locations(server_cert)
            ctx.check_hostname = False
            resp = urllib_transport(
                "GET", f"https://127.0.0.1:{port}/", {}, None,
                ssl_context=ctx)
            assert (resp.status, resp.body) == (200, '"ok"')
            # same endpoint without a client identity: handshake fails
            anon = ssl.create_default_context()
            anon.load_verify_locations(server_cert)
            anon.check_hostname = False
            with pytest.raises(Exception):
                urllib_transport(
                    "GET", f"https://127.0.0.1:{port}/", {}, None,
                    ssl_context=anon)
        finally:
            httpd.shutdown()

    def test_context_cached_per_keystore(self, tmp_path):
        from pincette_json_streams_spark.streaming.effects import (
            build_ssl_context,
        )
        p12, _, _ = _make_pkcs12(tmp_path, name="cacheme")
        a = build_ssl_context(p12, "secret")
        b = build_ssl_context(p12, "secret")
        assert a is b

    def test_rotated_keystore_rebuilds_context(self, tmp_path):
        """Cache key includes the file mtime: a rotated PKCS#12 at the
        same path must yield a FRESH SSLContext on a long-lived
        executor, not the stale cached identity."""
        import os as _os

        from pincette_json_streams_spark.streaming.effects import (
            build_ssl_context,
        )
        p12, _, _ = _make_pkcs12(tmp_path, name="rotate-a")
        a = build_ssl_context(p12, "secret")
        (tmp_path / "v2").mkdir()
        p12b, _, _ = _make_pkcs12(tmp_path / "v2", name="rotate-b")
        _os.replace(p12b, p12)  # rotate in place (new mtime)
        _os.utime(p12, ns=(_os.stat(p12).st_atime_ns,
                           _os.stat(p12).st_mtime_ns + 1))
        b = build_ssl_context(p12, "secret")
        assert a is not b


class TestEventTraces:
    """Automatic event-trace emission — the tracesTopic behavior
    (reference docs/telemetry.md:54-66)."""

    def _records(self, path):
        import os as _os
        if not _os.path.exists(path):
            return []
        with open(path) as fh:
            return [json.loads(l) for l in fh if l.strip()]

    def test_correlated_messages_traced_at_part_output(
            self, spark, tmp_path):
        from pincette_json_streams_spark import Application
        from pincette_json_streams_spark.plans.planner import SpecError  # noqa

        spool = str(tmp_path / "traces.jsonl")
        corr = "0f0f0f0f-1111-2222-3333-444455556666"
        src = spark.createDataFrame(
            [("m1", corr, "alice"), ("m2", None, None)],
            "_id string, _corr string, user string",
        ).withColumn("_jwt", F.when(
            F.col("user").isNotNull(),
            F.struct(F.col("user").alias("sub")))).drop("user")
        pctx = PipelineContext(
            catalog={"in": src},
            trace_producer=_make_spool_emitter(spool),
        )
        app = Application({"application": "traced-app", "parts": [
            {"type": "stream", "name": "s1", "fromTopic": "in",
             "pipeline": [{"$addFields": {"x": 1}}]},
        ]}, {"in": src}, pctx=pctx)
        assert app.streams["s1"].count() == 2  # pass-through
        recs = self._records(spool)
        assert len(recs) == 1  # only the correlated message
        (r,) = recs
        assert r["traceId"] == corr
        assert r["name"] == "s1.out"
        # reference field table (docs/telemetry.md): attributes.part is
        # the BARE part name; only `name` carries the subpart suffix
        assert r["attributes"]["part"] == "s1"
        assert r["serviceName"] == "traced-app"
        assert r["username"] == "alice"
        assert r["timestampNanos"] > 0

    def test_no_producer_means_no_plan_change(self, spark):
        from pincette_json_streams_spark.streaming.effects import (
            emit_event_traces,
        )
        df = spark.createDataFrame([("a", "c1")], "_id string, _corr string")
        pctx = PipelineContext()
        assert emit_event_traces(df, "p.out", pctx) is df

    def test_sampling_is_deterministic_on_corr(self, spark, tmp_path):
        import uuid as _uuid

        from pincette_json_streams_spark.streaming.effects import (
            emit_event_traces,
        )
        spool1 = str(tmp_path / "t1.jsonl")
        spool2 = str(tmp_path / "t2.jsonl")
        corrs = [str(_uuid.uuid5(_uuid.NAMESPACE_DNS, str(i)))
                 for i in range(200)]
        df = spark.createDataFrame(
            [(f"m{i}", c) for i, c in enumerate(corrs)],
            "_id string, _corr string")
        for spool in (spool1, spool2):
            pctx = PipelineContext(
                trace_producer=_make_spool_emitter(spool),
                trace_sample_pct=10, app_name="a")
            emit_event_traces(df, "p.out", pctx).count()
        ids1 = sorted(r["traceId"] for r in self._records(spool1))
        ids2 = sorted(r["traceId"] for r in self._records(spool2))
        assert ids1 == ids2          # same traces kept on every run
        assert 0 < len(ids1) < 200   # genuinely sampled


class TestEventTracesReviewLocks:
    def test_pct_zero_disables_tracing(self, spark, tmp_path):
        from pincette_json_streams_spark.streaming.effects import (
            emit_event_traces,
        )
        df = spark.createDataFrame(
            [("m", "0f0f0f0f-1111-2222-3333-444455556666")],
            "_id string, _corr string")
        pctx = PipelineContext(trace_producer=lambda r: None,
                               trace_sample_pct=0)
        assert emit_event_traces(df, "p.out", pctx) is df  # plan unchanged

    def test_non_struct_jwt_column_tolerated(self, spark, tmp_path):
        from pincette_json_streams_spark.streaming.effects import (
            emit_event_traces,
        )
        spool = str(tmp_path / "t.jsonl")
        df = spark.createDataFrame(
            [("m", "0f0f0f0f-1111-2222-3333-444455556666", "raw.jwt")],
            "_id string, _corr string, _jwt string")
        pctx = PipelineContext(trace_producer=_make_spool_emitter(spool),
                               app_name="a")
        out = emit_event_traces(df, "p.out", pctx)
        assert out.count() == 1  # no AttributeError at compile
        with open(spool) as fh:
            recs = [json.loads(l) for l in fh]
        assert len(recs) == 1 and "username" not in recs[0]

    def test_merge_and_join_parts_traced(self, spark, tmp_path):
        from pincette_json_streams_spark import Application
        spool = str(tmp_path / "traces.jsonl")
        corr = "0f0f0f0f-1111-2222-3333-444455556666"
        a = spark.createDataFrame([("m1", corr)],
                                  "_id string, _corr string")
        b = spark.createDataFrame([("m2", corr)],
                                  "_id string, _corr string")
        pctx = PipelineContext(
            catalog={"a": a, "b": b},
            trace_producer=_make_spool_emitter(spool))
        app = Application({"application": "t", "parts": [
            {"type": "merge", "name": "m", "fromTopics": ["a", "b"]},
            {"type": "join", "name": "j", "window": 1000,
             "left": {"fromTopic": "a", "on": "$_id"},
             "right": {"fromTopic": "b", "on": "$_id"}},
        ]}, {"a": a, "b": b}, pctx=pctx)
        app.streams["m"].count()
        app.streams["j"].count()
        with open(spool) as fh:
            names = sorted({json.loads(l)["name"] for l in fh})
        assert "m.merged" in names
        assert "j.left.in" in names and "j.right.in" in names


class TestAggregateCommandTraces:
    def test_commands_traced_with_command_name(self, spark, tmp_path):
        from pincette_json_streams_spark import Application
        spool = str(tmp_path / "traces.jsonl")
        corr = "0f0f0f0f-1111-2222-3333-444455556666"
        cmds = spark.createDataFrame(
            [("a1", "put", corr, '{"_id":"a1","_command":"put","v":1}'),
             ("a2", "delete", None, '{"_id":"a2","_command":"delete"}')],
            "_id string, _command string, _corr string, __json string")
        pctx = PipelineContext(
            catalog={"app-agg-command": cmds},
            trace_producer=_make_spool_emitter(spool))
        app = Application({"application": "app", "parts": [
            {"type": "aggregate", "name": "agg",
             "aggregateType": "agg"},
        ]}, {"app-agg-command": cmds}, pctx=pctx)
        # ONE action: every purpose stream shares the traced source
        # lineage, so each action replays the emission (at-least-once,
        # same contract as $log in batch mode)
        next(iter(app.streams.values())).count()
        with open(spool) as fh:
            recs = [json.loads(l) for l in fh if l.strip()]
        names = {r["name"] for r in recs}
        assert names == {"agg.command.put"}  # correlated only, named
        # attributes.part carries the BARE part name (reference field
        # table); the per-command subpart lives only in `name`
        assert all(r["attributes"]["part"] == "agg" for r in recs)
