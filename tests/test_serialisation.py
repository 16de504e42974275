"""Wire-format tests: gzip-CBOR serialisation with string fallback
(docs/serialisation.md) and the resumable $s3Csv
(S3CsvStage.java:145-183,232-244)."""

import json

import pytest

from pincette_json_streams_spark.sources.serialisation import (
    cbor_dumps,
    cbor_loads,
    decode_message,
    encode_message,
)


class TestCbor:
    @pytest.mark.parametrize("doc", [
        None, True, False, 0, 23, 24, 255, 256, 65535, 65536, 2**32,
        -1, -24, -25, -(2**32) - 5, 1.5, -2.25, "", "héllo wörld",
        "x" * 300, [], [1, [2, [3, None]]],
        {}, {"a": 1, "b": [True, {"c": "d"}], "e": None},
        {"nested": {"deep": {"deeper": [1.25, "two", None, False]}}},
    ])
    def test_roundtrip(self, doc):
        assert cbor_loads(cbor_dumps(doc)) == doc

    def test_canonical_headers(self):
        # RFC 8949 first-byte checks for the JSON data model
        assert cbor_dumps(0) == b"\x00"
        assert cbor_dumps(23) == b"\x17"
        assert cbor_dumps(24) == b"\x18\x18"
        assert cbor_dumps(-1) == b"\x20"
        assert cbor_dumps(None) == b"\xf6"
        assert cbor_dumps(True) == b"\xf5"
        assert cbor_dumps("a") == b"\x61a"
        assert cbor_dumps([1]) == b"\x81\x01"
        assert cbor_dumps({"a": 1}) == b"\xa1\x61a\x01"
        assert cbor_dumps(1.5)[0] == 0xFB

    def test_decodes_foreign_cbor_features(self):
        # tags are skipped; half/single floats decode
        assert cbor_loads(b"\xc0\x61x") == "x"          # tag 0 + text
        assert cbor_loads(b"\xf9\x3c\x00") == 1.0       # half float
        assert cbor_loads(b"\xfa\x3f\xc0\x00\x00") == 1.5  # single float

    def test_wire_roundtrip_and_fallback(self):
        doc = {"_id": "m1", "v": [1, 2.5, "x"], "ok": True}
        assert decode_message(encode_message(doc)) == doc
        # foreign payload -> string fallback
        assert decode_message(b"plain text") == "plain text"
        assert decode_message(json.dumps(doc).encode()) == json.dumps(doc)


class TestColumnCodec:
    def test_encode_decode_columns(self, spark):
        from pyspark.sql import functions as F

        from pincette_json_streams_spark.sources.serialisation import (
            decode_col, encode_col,
        )
        df = spark.createDataFrame(
            [("m1", 1, 2.5), ("m2", 2, None)],
            "_id string, a int, b double",
        )
        wired = df.select(
            encode_col(F.to_json(F.struct("*"))).alias("value"))
        back = wired.select(decode_col("value").alias("js")).collect()
        docs = sorted((json.loads(r["js"]) for r in back),
                      key=lambda d: d["_id"])
        assert docs[0] == {"_id": "m1", "a": 1, "b": 2.5}
        assert docs[1] == {"_id": "m2", "a": 2}  # to_json drops nulls

    def test_decode_col_string_fallback(self, spark):
        from pincette_json_streams_spark.sources.serialisation import (
            decode_col,
        )
        df = spark.createDataFrame([(b"not cbor",)], "value binary")
        out = df.select(decode_col("value").alias("js")).collect()
        assert out[0]["js"] == "not cbor"


class TestResumableS3Csv:
    def _pctx(self, tmp_path):
        from pincette_json_streams_spark.operators.stages import (
            PipelineContext,
        )
        from pincette_json_streams_spark.streaming.effects import (
            LocalObjectStore, LocalResumeStore,
        )
        return PipelineContext(
            object_store=LocalObjectStore(str(tmp_path / "s3")),
            resume_store=LocalResumeStore(str(tmp_path / "resume")),
        )

    def test_resume_skips_consumed_lines(self, spark, tmp_path):
        from pincette_json_streams_spark.operators.stages import (
            compile_pipeline,
        )
        pctx = self._pctx(tmp_path)
        body = "id\tv\n" + "".join(f"{i}\t{i * 10}\n" for i in range(5))
        pctx.object_store.write("b", "data.csv", body.encode())
        ev = spark.createDataFrame(
            [("e1", "b", "data.csv", "etag-1")],
            "_id string, bucket string, key string, etag string",
        )
        stage = [{"$s3Csv": {"bucket": "$bucket", "key": "$key",
                             "eTag": "$etag", "separator": "\t",
                             "resumeCollection": "resume"}}]
        first = compile_pipeline(ev, stage, pctx).collect()
        assert len(first) == 5
        # same object + same eTag: everything already consumed
        second = compile_pipeline(ev, stage, pctx).collect()
        assert second == []
        # new eTag (new object version): restart from the top
        ev2 = spark.createDataFrame(
            [("e2", "b", "data.csv", "etag-2")],
            "_id string, bucket string, key string, etag string",
        )
        third = compile_pipeline(ev2, stage, pctx).collect()
        assert len(third) == 5

    def test_partial_resume_position(self, spark, tmp_path):
        from pincette_json_streams_spark.operators.stages import (
            compile_pipeline,
        )
        pctx = self._pctx(tmp_path)
        body = "id\tv\n" + "".join(f"{i}\t{i}\n" for i in range(10))
        pctx.object_store.write("b", "d.csv", body.encode())
        # simulate a crash after line 6 (0-based index 5 recorded)
        pctx.resume_store.put("b/d.csv/e1", 5)
        ev = spark.createDataFrame(
            [("e1", "b", "d.csv", "e1")],
            "_id string, bucket string, key string, etag string",
        )
        out = compile_pipeline(ev, [
            {"$s3Csv": {"bucket": "$bucket", "key": "$key", "eTag": "$etag",
                        "separator": "\t", "resumeCollection": "r"}},
        ], pctx).collect()
        docs = [json.loads(r["value"]) for r in out]
        assert [d["id"] for d in docs] == [6, 7, 8, 9]
