"""Wire-format roundtrip operators over the transcript record shape.

`msgpack_roundtrip` re-buffers every turn exactly like the reference
engine does internally — the msgpack pair [EventTime ext0, map]
(src/flb_pack.c; src/flb_time.c:141-181) — then decodes its own bytes
back into columns. `avro_roundtrip` does the same through the Avro
binary encoding (src/flb_avro.c's output path, here pure Python since
the image lacks the spark-avro jar).

Both emit the decoded fields plus `n_bytes`, the exact wire size —
so the oracle can verify not just that decode(encode(x)) == x (which
a broken-but-symmetric codec would pass) but that the byte-level
encoding choices (fixstr vs str8 headers, canonical smallest ints,
zigzag varint widths) match the closed-form sizes the spec dictates.

Scale shape: a codec is inherently per-record work; `mapInPandas`
keeps it Arrow-batched (one Python crossing per batch, like the
murmur3 path in functions/hashing.py), embarrassingly parallel, and
shuffle-free — the 100 TB cost is one map pass.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame

from fluent_bit_spark.functions.wire import (
    avro_decode,
    avro_encode,
    pack_event,
    pack_turn_event,
    unpack_event,
    unpack_turn_event,
)

_OUT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp, n_bytes long"
)

AVRO_TRANSCRIPT_SCHEMA = [
    ("conv_id", "string"),
    ("turn_idx", "long"),
    ("role", "string"),
    ("text", "string"),
    ("tool", ["null", "string"]),
    ("ts_us", "long"),
]


def _ts_to_us(ts) -> int:
    return ts.value // 1000  # pandas ns -> µs


def msgpack_roundtrip(df: DataFrame) -> DataFrame:
    """transcripts -> reference msgpack event bytes -> decoded columns
    (+ exact wire size). EventTime carries (sec, nsec); µs precision
    survives the nsec field exactly."""

    def fn(pdfs: Iterable[pd.DataFrame]):
        for pdf in pdfs:
            # vectorized EventTime split: ns epoch -> (sec, nsec@µs grain)
            # (to_numpy pins the ns unit; Series.astype would silently
            # reinterpret a datetime64[us]-backed column as µs ints)
            us = (
                pdf["ts"].to_numpy(dtype="datetime64[ns]").astype("int64")
                // 1_000
            )
            secs = (us // 1_000_000).tolist()
            nsecs = ((us % 1_000_000) * 1_000).tolist()
            rows = []
            it = zip(
                secs,
                nsecs,
                pdf["conv_id"].tolist(),
                pdf["turn_idx"].tolist(),
                pdf["role"].tolist(),
                pdf["text"].tolist(),
                pdf["tool"].tolist(),
            )
            for sec, nsec, conv, ti, role, text, tool in it:
                if tool is not None and tool != tool:  # pandas NaN
                    tool = None
                buf = pack_turn_event(
                    sec, nsec, conv, int(ti), role, text, tool
                )
                decoded = unpack_turn_event(buf)
                if decoded is None:  # fast decode declined: generic path
                    decoded = unpack_event(buf)
                dsec, dnsec, rec = decoded
                rows.append(
                    (
                        rec["conv_id"],
                        rec["turn_idx"],
                        rec["role"],
                        rec["text"],
                        rec["tool"],
                        pd.Timestamp((dsec * 1_000_000_000) + dnsec),
                        len(buf),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "conv_id", "turn_idx", "role", "text", "tool",
                    "ts", "n_bytes",
                ],
            )

    return df.select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    ).mapInPandas(fn, _OUT_SCHEMA)


def avro_roundtrip(df: DataFrame) -> DataFrame:
    """transcripts -> Avro binary bytes (zigzag varints, union-index
    nullable tool, µs-epoch long timestamp) -> decoded columns."""

    def fn(pdfs: Iterable[pd.DataFrame]):
        for pdf in pdfs:
            rows = []
            for r in pdf.itertuples(index=False):
                rec = {
                    "conv_id": r.conv_id,
                    "turn_idx": int(r.turn_idx),
                    "role": r.role,
                    "text": r.text,
                    "tool": None if r.tool is None else r.tool,
                    "ts_us": _ts_to_us(r.ts),
                }
                buf = avro_encode(rec, AVRO_TRANSCRIPT_SCHEMA)
                d = avro_decode(buf, AVRO_TRANSCRIPT_SCHEMA)
                rows.append(
                    (
                        d["conv_id"],
                        d["turn_idx"],
                        d["role"],
                        d["text"],
                        d["tool"],
                        pd.Timestamp(d["ts_us"] * 1000),
                        len(buf),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "conv_id", "turn_idx", "role", "text", "tool",
                    "ts", "n_bytes",
                ],
            )

    return df.select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    ).mapInPandas(fn, _OUT_SCHEMA)


_FWD_SCHEMA = (
    "tag string, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts timestamp, n_events long, "
    "msg_bytes long"
)


def forward_roundtrip(df: DataFrame) -> DataFrame:
    """Forward-protocol framing parity: each (tag, conv_id) group is
    packed into ONE Forward-mode message — the msgpack array
    ``[tag, [[EventTime, record], ...]]`` out_forward sends and
    in_forward's fw_prot.c parses — then unpacked back into rows,
    carrying the event count and the exact message wire size.

    Scale shape: `applyInPandas` groups on (tag, conv_id), so a
    message is conversation-bounded (the shuffle key is the same
    conv_id salt/repartition key the rest of the pipeline uses) —
    never one group per tag, which would serialize a whole route at
    100 TB.
    """

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tag, conv = key
        pdf = pdf.sort_values("turn_idx")
        events = []
        for r in pdf.itertuples(index=False):
            us = _ts_to_us(r.ts)
            sec, nsec = divmod(us, 1_000_000)
            events.append(
                (
                    sec,
                    nsec * 1000,
                    {
                        "conv_id": r.conv_id,
                        "turn_idx": int(r.turn_idx),
                        "role": r.role,
                        "text": r.text,
                        "tool": None if r.tool is None else r.tool,
                    },
                )
            )
        from fluent_bit_spark.functions.wire import (
            pack_forward_message,
            unpack_forward_message,
        )

        buf = pack_forward_message(tag, events)
        tag2, back = unpack_forward_message(buf)
        rows = [
            (
                tag2,
                rec["conv_id"],
                rec["turn_idx"],
                rec["role"],
                rec["text"],
                rec["tool"],
                pd.Timestamp(sec * 1_000_000_000 + nsec),
                len(back),
                len(buf),
            )
            for sec, nsec, rec in back
        ]
        return pd.DataFrame(
            rows,
            columns=[
                "tag", "conv_id", "turn_idx", "role", "text", "tool",
                "ts", "n_events", "msg_bytes",
            ],
        )

    return df.select(
        "tag", "conv_id", "turn_idx", "role", "text", "tool", "ts"
    ).groupBy("tag", "conv_id").applyInPandas(fn, _FWD_SCHEMA)


_KAFKA_SCHEMA = (
    "conv_id string, n_records long, batch_bytes long, "
    "base_ts_ms long, max_ts_ms long, crc_ok boolean"
)


def kafka_batch_roundtrip(df: DataFrame) -> DataFrame:
    """Kafka v2 record-batch framing parity (plugins/out_kafka/kafka.c
    produce path; batch layout per KIP-98 / the on-disk message format
    v2): each conversation becomes ONE record batch — key = conv_id
    UTF-8, value = the same msgpack event bytes out_kafka's
    FLB_KAFKA_FMT_MSGP mode ships, timestamps as ms deltas against the
    first turn — packed to real bytes (big-endian fixed header,
    CRC-32C over attributes..records, zigzag-varint record bodies),
    then unpacked from those bytes and field-compared against the
    input rows; any mismatch raises inside the task.

    Emits per-batch accounting the oracle re-derives in closed form:
    record count, exact batch wire size, base/max timestamps, and the
    CRC validity flag from the decode side.

    Scale shape: `applyInPandas` keyed on conv_id — the batch is
    conversation-bounded and the shuffle key is the pipeline's usual
    conv_id partitioning, so 100 TB cost is one co-partitioned pass;
    all byte work is Arrow-batched Python, never per-row UDF calls.
    """

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from fluent_bit_spark.functions.wire import (
            pack_event,
            pack_kafka_batch,
            unpack_event,
            unpack_kafka_batch,
        )

        (conv,) = key
        pdf = pdf.sort_values("turn_idx")
        recs = []
        for r in pdf.itertuples(index=False):
            us = _ts_to_us(r.ts)
            sec, nsec = divmod(us, 1_000_000)
            val = pack_event(
                sec,
                nsec * 1000,
                {
                    "conv_id": r.conv_id,
                    "turn_idx": int(r.turn_idx),
                    "role": r.role,
                    "text": r.text,
                    "tool": None if r.tool is None else r.tool,
                },
            )
            recs.append((us // 1000, conv.encode(), val))
        buf = pack_kafka_batch(recs)
        back, crc_ok = unpack_kafka_batch(buf)
        if back != recs:
            raise ValueError(f"kafka batch roundtrip mismatch for {conv}")
        for _ts_ms, _key, val in back:
            _sec, _nsec, rec = unpack_event(val)
            if rec["conv_id"] != conv:
                raise ValueError("record value decode mismatch")
        return pd.DataFrame(
            [
                (
                    conv,
                    len(recs),
                    len(buf),
                    recs[0][0],
                    max(r[0] for r in recs),
                    crc_ok,
                )
            ],
            columns=[
                "conv_id", "n_records", "batch_bytes",
                "base_ts_ms", "max_ts_ms", "crc_ok",
            ],
        )

    return (
        df.select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .groupBy("conv_id")
        .applyInPandas(fn, _KAFKA_SCHEMA)
    )


_MQTT_SCHEMA = (
    "conv_id string, turn_idx int, qos int, topic string, "
    "packet_id int, payload string, n_bytes long"
)


def mqtt_roundtrip(df: DataFrame) -> DataFrame:
    """MQTT PUBLISH framing parity (plugins/in_mqtt/mqtt_prot.c:222
    mqtt_handle_publish + the Remaining-Length decode at :341-355):
    each turn is framed as one PUBLISH packet — topic `fbs/<conv_id>`,
    payload = the turn text, qos = turn_idx % 3 (exercising the
    QoS>0 packet-id branch) — then parsed back, carrying the exact
    frame size so the oracle can pin the varint/header layout
    closed-form.

    Scale shape: per-record codec work, Arrow-batched mapInPandas,
    shuffle-free."""
    from fluent_bit_spark.functions.wire import (
        pack_mqtt_publish,
        unpack_mqtt_publish,
    )

    def fn(pdfs: Iterable[pd.DataFrame]):
        for pdf in pdfs:
            rows = []
            for r in pdf.itertuples(index=False):
                qos = int(r.turn_idx) % 3
                buf = pack_mqtt_publish(
                    f"fbs/{r.conv_id}",
                    ("" if r.text is None else r.text).encode("utf-8"),
                    qos=qos,
                    packet_id=(int(r.turn_idx) % 65536) if qos else 0,
                )
                dq, topic, pid, payload = unpack_mqtt_publish(buf)
                rows.append(
                    (
                        r.conv_id,
                        int(r.turn_idx),
                        dq,
                        topic,
                        pid,
                        payload.decode("utf-8"),
                        len(buf),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "conv_id", "turn_idx", "qos", "topic",
                    "packet_id", "payload", "n_bytes",
                ],
            )

    return df.select("conv_id", "turn_idx", "text").mapInPandas(
        fn, _MQTT_SCHEMA
    )


_COLLECTD_SCHEMA = (
    "conv_id string, turn_idx int, host string, plugin string, "
    "plugin_instance string, type string, type_instance string, "
    "time_sec long, text_len double, n_bytes long"
)


def collectd_roundtrip(df: DataFrame) -> DataFrame:
    """collectd binary-protocol parity (plugins/in_collectd/
    netprot.c:49-59 part table, :180-203 value decode): each turn
    becomes one packet — host=conv_id, plugin_instance=role,
    type_instance=tool (part omitted when NULL, like the reference's
    presence-conditional packing at netprot.c:150-178), one gauge
    value = the text length — then decoded back with the exact packet
    size for the closed-form size oracle."""
    from fluent_bit_spark.functions.wire import (
        DS_GAUGE,
        pack_collectd,
        unpack_collectd,
    )

    def fn(pdfs: Iterable[pd.DataFrame]):
        for pdf in pdfs:
            rows = []
            for r in pdf.itertuples(index=False):
                text = "" if r.text is None else r.text
                buf = pack_collectd(
                    host=r.conv_id,
                    plugin="transcript",
                    plugin_instance=r.role,
                    type_="gauge",
                    type_instance=None if r.tool is None else r.tool,
                    time_sec=_ts_to_us(r.ts) // 1_000_000,
                    values=[(DS_GAUGE, float(len(text)))],
                )
                h = unpack_collectd(buf)
                rows.append(
                    (
                        r.conv_id,
                        int(r.turn_idx),
                        h["host"],
                        h["plugin"],
                        h["plugin_instance"],
                        h["type"],
                        h.get("type_instance"),
                        h["time_sec"],
                        h["values"][0][1],
                        len(buf),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "conv_id", "turn_idx", "host", "plugin",
                    "plugin_instance", "type", "type_instance",
                    "time_sec", "text_len", "n_bytes",
                ],
            )

    return df.select("conv_id", "turn_idx", "role", "text", "tool", "ts").mapInPandas(
        fn, _COLLECTD_SCHEMA
    )


_HTTP_SCHEMA = (
    "conv_id string, turn_idx int, payload string, n_chunks long, "
    "n_bytes long"
)


def http_chunked_roundtrip(df: DataFrame, chunk_size: int = 48) -> DataFrame:
    """HTTP/1.1 chunked transfer framing parity
    (src/flb_http_client.c:258 process_chunked_data): each turn's text
    is chunk-encoded at `chunk_size` bytes and decoded back, carrying
    the chunk count and the exact on-wire size — the oracle re-derives
    both closed-form from the payload byte length (hex-header widths
    included). Arrow-batched map stage, shuffle-free."""
    from fluent_bit_spark.functions.wire import (
        http_chunked_decode,
        http_chunked_encode,
    )

    def fn(pdfs: Iterable[pd.DataFrame]):
        for pdf in pdfs:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = ("" if r.text is None else r.text).encode("utf-8")
                buf = http_chunked_encode(payload, chunk_size)
                dec = http_chunked_decode(buf)
                n_chunks = -(-len(payload) // chunk_size)
                rows.append(
                    (
                        r.conv_id,
                        int(r.turn_idx),
                        dec.decode("utf-8"),
                        n_chunks,
                        len(buf),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "conv_id", "turn_idx", "payload", "n_chunks", "n_bytes",
                ],
            )

    return df.select("conv_id", "turn_idx", "text").mapInPandas(
        fn, _HTTP_SCHEMA
    )


_WS_SCHEMA = (
    "conv_id string, turn_idx int, payload_bytes long, header_hex string, "
    "n_bytes long, ok boolean"
)


def websocket_roundtrip(df: DataFrame) -> DataFrame:
    """WebSocket data-frame parity (plugins/out_websocket/
    websocket.c:92-156 flb_ws_sendDataFrameHeader): each turn's text,
    repeated 1/9/17x by turn_idx to exercise both in-data length
    branches (7-bit < 126 and 16-bit < 65536; the 64-bit branch is
    unit-tested -- transcript turns never reach 64 KiB), is packed as
    one masked client frame with the reference's fixed
    {0x12,0x34,0x56,0x78} key, then unmasked back.  Emits the header
    bytes as hex plus the exact frame size so the oracle re-derives
    the opcode/MASK-bit/extended-length layout closed-form, and `ok` =
    the unmasked payload byte-matches the original (pinning that
    masking is an involution, not just symmetric-broken).

    Scale shape: per-record codec work, Arrow-batched mapInPandas,
    shuffle-free."""
    from fluent_bit_spark.functions.wire import pack_ws_frame, unpack_ws_frame

    def fn(pdfs: Iterable[pd.DataFrame]):
        for pdf in pdfs:
            rows = []
            for r in pdf.itertuples(index=False):
                rep = 1 + (int(r.turn_idx) % 3) * 8
                payload = (("" if r.text is None else r.text) * rep).encode("utf-8")
                buf = pack_ws_frame(payload)
                head_len = 6 if len(payload) < 126 else 8 if len(payload) < 65536 else 14
                _, out, consumed = unpack_ws_frame(buf)
                rows.append(
                    (
                        r.conv_id,
                        int(r.turn_idx),
                        len(payload),
                        buf[:head_len].hex(),
                        len(buf),
                        out == payload and consumed == len(buf),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "conv_id", "turn_idx", "payload_bytes", "header_hex",
                    "n_bytes", "ok",
                ],
            )

    return df.select("conv_id", "turn_idx", "text").mapInPandas(fn, _WS_SCHEMA)


_TD_SCHEMA = "conv_id string, n_records long, mp_bytes long, gz_ok boolean"


def td_roundtrip(df: DataFrame) -> DataFrame:
    """Treasure Data upload parity (plugins/out_td/td.c:103-129
    td_format + td_http.c:50 flb_gzip_compress): per flush chunk (one
    conv_id group), every record is repacked as a msgpack map with the
    injected leading 'time' int key (epoch seconds) followed by the
    original keys, the maps are concatenated into one stream, and the
    stream is gzipped for the PUT body.  The decoded-back stream is
    field-compared in-task (gz_ok covers gunzip + msgpack decode +
    value equality); `mp_bytes` is the exact uncompressed wire size,
    re-derived closed-form by the oracle (gzip size is NOT exposed --
    it depends on the zlib build, not the format contract).

    Scale shape: one shuffle on conv_id (applyInPandas group =
    conversation-bounded state), codec work Arrow-batched."""
    import gzip as _gzip

    from fluent_bit_spark.functions.wire import msgpack_unpack, pack_td_record

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("turn_idx")
        recs = []
        for r in pdf.itertuples(index=False):
            recs.append(
                {
                    "time": _ts_to_us(r.ts) // 1_000_000,
                    "conv_id": r.conv_id,
                    "turn_idx": int(r.turn_idx),
                    "role": r.role,
                    "text": r.text,
                    "tool": None if r.tool is None else r.tool,
                }
            )
        # fast-path encode; the decode walk below stays on the generic
        # decoder, so every run cross-verifies the specialized encoder
        stream = b"".join(pack_td_record(*m.values()) for m in recs)
        body = _gzip.compress(stream, mtime=0)
        # decode back: gunzip, walk the concatenated maps
        out, pos, back = _gzip.decompress(body), 0, []
        while pos < len(out):
            m, pos = msgpack_unpack(out, pos)
            back.append(m)
        ok = back == recs and pos == len(stream)
        return pd.DataFrame(
            [(pdf.iloc[0].conv_id, len(recs), len(stream), ok)],
            columns=["conv_id", "n_records", "mp_bytes", "gz_ok"],
        )

    return (
        df.select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .groupBy("conv_id")
        .applyInPandas(fn, _TD_SCHEMA)
    )


_KPRODUCE_SCHEMA = (
    "conv_id string, n_records long, batch_bytes long, request_bytes long, "
    "api_key int, correlation_id int, crc_ok boolean"
)


def kafka_produce_roundtrip(df: DataFrame) -> DataFrame:
    """Kafka Produce-request wire framing parity (the envelope
    out_kafka ships each flush through librdkafka — plugins/out_kafka/
    kafka.c produce path; layout per the public Kafka protocol,
    Produce v3): each conversation's v2 record batch (the same bytes
    kafka_batch_roundtrip pins) is wrapped in one request — int32 size
    prefix, header (api_key=0 Produce, v3, correlation_id = record
    count for a deterministic non-constant value, client_id
    'fluent-bit'), null transactional_id, acks=-1, topic
    'fbs.transcripts', partition 0, record set as BYTES — then parsed
    back and the inner batch CRC re-verified.  The oracle re-derives
    the exact request size closed-form (fixed 40-byte envelope +
    client_id + topic + batch bytes).

    Scale shape: same conv_id applyInPandas pass as the batch
    roundtrip — one co-partitioned shuffle, Arrow-batched bytes."""

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from fluent_bit_spark.functions.wire import (
            pack_event,
            pack_kafka_batch,
            pack_kafka_produce_request,
            unpack_kafka_batch,
            unpack_kafka_produce_request,
        )

        (conv,) = key
        pdf = pdf.sort_values("turn_idx")
        recs = []
        for r in pdf.itertuples(index=False):
            us = _ts_to_us(r.ts)
            sec, nsec = divmod(us, 1_000_000)
            val = pack_event(
                sec, nsec * 1000,
                {
                    "conv_id": r.conv_id,
                    "turn_idx": int(r.turn_idx),
                    "role": r.role,
                    "text": r.text,
                    "tool": None if r.tool is None else r.tool,
                },
            )
            recs.append((us // 1000, conv.encode(), val))
        batch = pack_kafka_batch(recs)
        req = pack_kafka_produce_request(
            "fluent-bit", "fbs.transcripts", 0, batch,
            correlation_id=len(recs),
        )
        h = unpack_kafka_produce_request(req)
        if (h["topic"], h["partition"], h["client_id"]) != (
            "fbs.transcripts", 0, "fluent-bit"
        ) or h["record_set"] != batch:
            raise ValueError(f"produce request roundtrip mismatch for {conv}")
        back, crc_ok = unpack_kafka_batch(h["record_set"])
        if back != recs:
            raise ValueError(f"inner batch mismatch for {conv}")
        return pd.DataFrame(
            [(conv, len(recs), len(batch), len(req), h["api_key"],
              h["correlation_id"], crc_ok)],
            columns=["conv_id", "n_records", "batch_bytes", "request_bytes",
                     "api_key", "correlation_id", "crc_ok"],
        )

    return (
        df.select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .groupBy("conv_id")
        .applyInPandas(fn, _KPRODUCE_SCHEMA)
    )
