"""MQTT 3.1.1 wire-transport tests (SURVEY §2.1 O7/O23): the
reference's actual protocol moved over real sockets — codec
round-trips, QoS-1 at-least-once delivery with deterministic DUP
redelivery, and the full Spark publish→broker→subscribe→parse path.

Reference parity: publish QoS 1 non-retained to ``factory/telemetry``
(IoTSimulator.java:55,158-162, topic :31); blocking subscribe loop
(realtime_inference.py:81-89)."""

from __future__ import annotations

import json
import socket
import time

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from real_time_predictive_maintenance_data_pipeline_spark.sources.mqtt_wire import (
    CONNACK,
    PUBACK,
    PUBLISH,
    SUBACK,
    MAX_REMAINING_LENGTH,
    MiniBroker,
    MqttPublisher,
    PacketStream,
    SubscriberBridge,
    decode_remaining_length,
    encode_connect,
    encode_publish,
    encode_remaining_length,
    encode_subscribe,
    parse_packet,
    publish_partitions,
)

TOPIC = "factory/telemetry"  # IoTSimulator.java:31


# ---------------------------------------------------------------------------
# Codec
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=MAX_REMAINING_LENGTH))
def test_remaining_length_roundtrip(n):
    enc = encode_remaining_length(n)
    assert 1 <= len(enc) <= 4
    val, used = decode_remaining_length(enc)
    assert (val, used) == (n, len(enc))


def test_remaining_length_spec_vectors():
    """Boundary vectors straight from OASIS MQTT 3.1.1 table 2.4."""
    assert encode_remaining_length(0) == b"\x00"
    assert encode_remaining_length(127) == b"\x7f"
    assert encode_remaining_length(128) == b"\x80\x01"
    assert encode_remaining_length(16_383) == b"\xff\x7f"
    assert encode_remaining_length(16_384) == b"\x80\x80\x01"
    assert encode_remaining_length(MAX_REMAINING_LENGTH) == b"\xff\xff\xff\x7f"
    with pytest.raises(ValueError):
        encode_remaining_length(MAX_REMAINING_LENGTH + 1)


@settings(max_examples=100, deadline=None)
@given(
    topic=st.text(
        alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
        min_size=1,
        max_size=50,
    ),
    payload=st.binary(max_size=2000),
    pid=st.integers(min_value=1, max_value=0xFFFF),
    dup=st.booleans(),
)
def test_publish_roundtrip(topic, payload, pid, dup):
    frame = encode_publish(topic, payload, qos=1, packet_id=pid, dup=dup)
    pkt, used = parse_packet(frame)
    assert used == len(frame)
    assert pkt.type == PUBLISH
    assert (pkt.topic, pkt.payload, pkt.packet_id, pkt.qos, pkt.dup) == (
        topic,
        payload,
        pid,
        1,
        dup,
    )


def test_parse_incomplete_frame_waits():
    frame = encode_publish(TOPIC, b"x" * 100, qos=0)
    with pytest.raises(IndexError):
        parse_packet(frame[:-1])  # short one byte -> caller reads more


def test_connect_and_subscribe_frames():
    c = encode_connect("abc")
    # fixed header: CONNECT type, then protocol name MQTT, level 4
    assert c[0] == 0x10 and b"MQTT" in c and c[c.index(b"MQTT") + 4] == 4
    s = encode_subscribe(7, TOPIC, qos=1)
    assert s[0] == 0x82  # SUBSCRIBE with mandated 0b0010 flags
    pkt, _ = parse_packet(s)
    assert pkt.packet_id == 7


# ---------------------------------------------------------------------------
# Broker + clients over real sockets
# ---------------------------------------------------------------------------


@pytest.fixture()
def broker():
    b = MiniBroker()
    yield b
    b.close()


def test_qos1_publish_subscribe_live(broker, tmp_path):
    """Real MQTT frames over a real TCP connection: publisher QoS 1 →
    broker → subscriber bridge spool, every payload delivered exactly
    once to the spool and every frame PUBACKed (no in-flight left)."""
    sub = SubscriberBridge(
        broker.host, broker.port, TOPIC, str(tmp_path / "spool")
    )
    pub = MqttPublisher(broker.host, broker.port)
    payloads = [
        json.dumps(
            {"machineId": f"m-{i:02d}", "temperature": 60.0 + i,
             "vibration": 1.5, "timestamp": 1_700_000_000 + i}
        )
        for i in range(25)
    ]
    for p in payloads:
        sends = pub.publish(TOPIC, p.encode(), qos=1)
        assert sends == 1  # healthy link: single transmission sufficed
    deadline = time.time() + 10
    while sub.received < len(payloads) and time.time() < deadline:
        time.sleep(0.05)
    pub.close()
    sub.close()
    assert sub.received == len(payloads)
    got = (tmp_path / "spool" / "mqtt_spool.jsonl").read_text().splitlines()
    assert got == payloads  # in-order, exactly-once in the spool
    assert broker.inflight_count() == 0  # bridge PUBACKed everything


def test_qos1_redelivery_is_at_least_once(broker):
    """A subscriber that withholds PUBACK gets the SAME packet id again
    with DUP=1 after ``redeliver()`` — the at-least-once contract of
    QoS 1 (IoTSimulator.java:55), exercised deterministically."""
    # raw subscriber that never acks
    sock = socket.create_connection((broker.host, broker.port), timeout=5)
    stream = PacketStream(sock)
    sock.sendall(encode_connect("lazy-sub"))
    assert stream.read_packet(timeout=5).type == CONNACK
    sock.sendall(encode_subscribe(1, TOPIC, qos=1))
    assert stream.read_packet(timeout=5).type == SUBACK

    pub = MqttPublisher(broker.host, broker.port)
    pub.publish(TOPIC, b"hello-once", qos=1)

    first = stream.read_packet(timeout=5)
    assert first.type == PUBLISH and first.payload == b"hello-once"
    assert not first.dup
    assert broker.inflight_count() == 1  # un-acked

    assert broker.redeliver() == 1
    again = stream.read_packet(timeout=5)
    assert again.type == PUBLISH and again.payload == b"hello-once"
    assert again.dup and again.packet_id == first.packet_id

    # now ack: in-flight drains, further redelivery is a no-op
    from real_time_predictive_maintenance_data_pipeline_spark.sources.mqtt_wire import (
        encode_puback,
    )

    sock.sendall(encode_puback(first.packet_id))
    deadline = time.time() + 5
    while broker.inflight_count() and time.time() < deadline:
        time.sleep(0.05)
    assert broker.inflight_count() == 0
    assert broker.redeliver() == 0
    pub.close()
    sock.close()


def test_broker_survives_malformed_frames(broker, tmp_path):
    """A client sending spec-violating bytes (remaining-length field
    longer than 4 bytes) must cost only ITS connection — the broker
    keeps serving every other session."""
    rogue = socket.create_connection((broker.host, broker.port), timeout=5)
    rogue.sendall(b"\xff" * 8)  # malformed remaining length
    time.sleep(0.2)

    sub = SubscriberBridge(broker.host, broker.port, TOPIC, str(tmp_path / "sp"))
    pub = MqttPublisher(broker.host, broker.port)
    pub.publish(TOPIC, b"still-alive", qos=1)
    deadline = time.time() + 5
    while sub.received < 1 and time.time() < deadline:
        time.sleep(0.05)
    assert sub.received == 1
    pub.close()
    sub.close()
    rogue.close()


# ---------------------------------------------------------------------------
# Spark end-to-end: distributed publish -> broker -> bridge -> parse
# ---------------------------------------------------------------------------


def test_spark_mqtt_roundtrip_end_to_end(spark, broker, tmp_path):
    """O7+O23 with Spark on both ends: a telemetry batch publishes via
    per-partition QoS-1 connections (``foreachPartition`` — the Kafka
    per-task-producer shape), the bridge spools the received MQTT
    payloads, and Spark reads the spool back through the standard
    parse→quarantine path. Every record survives the wire bit-exactly."""
    sub = SubscriberBridge(
        broker.host, broker.port, TOPIC, str(tmp_path / "spool")
    )

    n = 40
    src = spark.createDataFrame(
        [
            (f"m-{i % 5}", 60.0 + i, 1.0 + i / 10.0, 1_700_000_000 + i)
            for i in range(n)
        ],
        "machineId string, temperature double, vibration double, timestamp long",
    )
    from real_time_predictive_maintenance_data_pipeline_spark.functions.telemetry import (
        to_payload_json,
    )

    wire = src.repartition(4).select(
        to_payload_json(
            F.col("machineId"),
            F.col("temperature"),
            F.col("vibration"),
            F.col("timestamp"),
        ).alias("value")
    )
    publish_partitions(wire, broker.host, broker.port, TOPIC)

    deadline = time.time() + 20
    while sub.received < n and time.time() < deadline:
        time.sleep(0.1)
    sub.close()
    assert sub.received == n

    from real_time_predictive_maintenance_data_pipeline_spark.streaming.pipeline import (
        parse_telemetry,
        quarantine_split,
    )

    back = spark.read.text(str(tmp_path / "spool"))
    good, bad = quarantine_split(parse_telemetry(back.select("value")))
    assert bad.count() == 0
    got = sorted(
        (r.machineId, r.temperature, r.vibration, r.timestamp)
        for r in good.collect()
    )
    want = sorted(
        (f"m-{i % 5}", 60.0 + i, 1.0 + i / 10.0, 1_700_000_000 + i)
        for i in range(n)
    )
    assert got == want


# ---------------------------------------------------------------------------
# Round-7 hardening (ADVICE r6): drain stale packets, quarantine bad
# payloads, surface loop errors, globally-unique client ids
# ---------------------------------------------------------------------------


def test_publish_drains_stale_packets_before_matching_puback():
    """A PINGRESP or a stale PUBACK sitting in the buffer ahead of the
    matching PUBACK must not consume the attempt's read: publish keeps
    draining within the ack deadline and returns after ONE send."""
    import threading

    from real_time_predictive_maintenance_data_pipeline_spark.sources.mqtt_wire import (
        encode_connack,
        encode_pingresp,
        encode_puback,
    )

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    host, port = srv.getsockname()

    def fake_broker():
        conn, _ = srv.accept()
        stream = PacketStream(conn)
        assert stream.read_packet(timeout=5).type != PUBLISH  # CONNECT
        conn.sendall(encode_connack())
        pkt = stream.read_packet(timeout=5)
        assert pkt.type == PUBLISH
        # noise FIRST: a ping response and a PUBACK for a different id,
        # THEN the real ack — all in one burst
        conn.sendall(
            encode_pingresp()
            + encode_puback((pkt.packet_id % 0xFFFF) + 1)
            + encode_puback(pkt.packet_id)
        )
        stream.read_packet(timeout=5)  # DISCONNECT (or EOF)
        conn.close()

    t = threading.Thread(target=fake_broker, daemon=True)
    t.start()
    pub = MqttPublisher(host, port, ack_timeout=5.0)
    sends = pub.publish(TOPIC, b"payload", qos=1)
    assert sends == 1  # no spurious DUP re-send, no TimeoutError
    pub.close()
    t.join(timeout=5)
    srv.close()


def test_subscriber_quarantines_newline_and_binary_payloads(broker, tmp_path):
    """The spool is line-per-record: payloads that are not valid UTF-8
    or embed newlines are counted in ``rejected`` and PUBACKed but never
    written — one message can never split into several spool records."""
    sub = SubscriberBridge(broker.host, broker.port, TOPIC, str(tmp_path / "sp"))
    pub = MqttPublisher(broker.host, broker.port)
    pub.publish(TOPIC, b"good-1", qos=1)
    pub.publish(TOPIC, b"evil\nsplit", qos=1)   # embedded newline
    pub.publish(TOPIC, b"\xff\xfe\x00bad", qos=1)  # not UTF-8
    pub.publish(TOPIC, b"good-2", qos=1)
    deadline = time.time() + 10
    while sub.received + sub.rejected < 4 and time.time() < deadline:
        time.sleep(0.05)
    pub.close()
    sub.close()
    assert (sub.received, sub.rejected) == (2, 2)
    got = (tmp_path / "sp" / "mqtt_spool.jsonl").read_text().splitlines()
    assert got == ["good-1", "good-2"]
    assert broker.inflight_count() == 0  # quarantined frames still acked


def test_subscriber_surfaces_loop_error_on_close():
    """A malformed frame kills the spool thread — close() must re-raise
    the stored error instead of the caller watching ``received`` stall."""
    import threading

    from real_time_predictive_maintenance_data_pipeline_spark.sources.mqtt_wire import (
        encode_connack,
        encode_suback,
    )

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    host, port = srv.getsockname()

    def evil_broker():
        conn, _ = srv.accept()
        stream = PacketStream(conn)
        stream.read_packet(timeout=5)  # CONNECT
        conn.sendall(encode_connack())
        stream.read_packet(timeout=5)  # SUBSCRIBE
        conn.sendall(encode_suback(1, 1))
        time.sleep(0.1)
        conn.sendall(b"\xff" * 8)  # malformed remaining length
        time.sleep(1.0)
        conn.close()

    t = threading.Thread(target=evil_broker, daemon=True)
    t.start()
    sub = SubscriberBridge(host, port, TOPIC, str(__import__("tempfile").mkdtemp()))
    deadline = time.time() + 5
    while sub._error is None and time.time() < deadline:
        time.sleep(0.05)
    with pytest.raises(RuntimeError, match="subscriber thread died"):
        sub.close()
    t.join(timeout=5)
    srv.close()


def test_unique_client_id_is_globally_unique():
    """[MQTT-3.1.3-2]: duplicate ClientIds make a broker disconnect the
    existing session — partition publishers must never collide even on
    the same host+pid (uuid suffix) and must differ across hosts
    (hostname component)."""
    from real_time_predictive_maintenance_data_pipeline_spark.sources.mqtt_wire import (
        unique_client_id,
    )

    ids = {unique_client_id("rtpmdp-part") for _ in range(100)}
    assert len(ids) == 100
    one = ids.pop()
    assert socket.gethostname() in one and one.startswith("rtpmdp-part-")


def test_mqtt_roundtrip_catalog_query_delivers_all(spark):
    """The driver-facing ``telemetry_mqtt_roundtrip`` query must deliver
    every payload over the wire (QoS 1, healthy in-process link) with
    nothing quarantined — the rows-only driver row then rests on a
    locally-pinned exact contract, not just 'returned rows'."""
    from real_time_predictive_maintenance_data_pipeline_spark.plans import all_queries

    row = all_queries()["telemetry_mqtt_roundtrip"].spark(spark, "").first()
    assert row.n_delivered == 400
    assert row.n_quarantined == 0
    assert row.n_machines >= 1


# ---------------------------------------------------------------------------
# §4.7 topic filters: wildcard matching, filter validation, routing
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    ("topic_filter", "topic", "expect"),
    [
        # spec §4.7.1.2 examples: '#' matches the parent level itself
        ("sport/tennis/player1/#", "sport/tennis/player1", True),
        ("sport/tennis/player1/#", "sport/tennis/player1/ranking", True),
        ("sport/tennis/player1/#", "sport/tennis/player1/score/wimbledon", True),
        ("sport/#", "sport", True),
        ("#", "sport/tennis/player1", True),
        # '+' matches exactly one level — no more, no fewer
        ("sport/tennis/+", "sport/tennis/player1", True),
        ("sport/tennis/+", "sport/tennis/player2", True),
        ("sport/tennis/+", "sport/tennis/player1/ranking", False),
        ("sport/+", "sport", False),  # §4.7.1.3: does NOT match parent
        ("sport/+", "sport/", True),  # empty level IS a level
        ("+", "sport", True),
        ("+", "sport/tennis", False),
        ("+/+", "/finance", True),  # §4.7.1.3 example
        ("/+", "/finance", True),
        ("+", "/finance", False),
        # byte-exact otherwise: no case folding, empty levels significant
        ("sport/Tennis", "sport/tennis", False),
        ("a//b", "a//b", True),
        ("a/b", "a//b", False),
        # [MQTT-4.7.2-1]: wildcard filters must not match $-topics
        ("#", "$SYS/broker/load", False),
        ("+/monitor/Clients", "$SYS/monitor/Clients", False),
        ("$SYS/#", "$SYS/broker/load", True),  # non-wildcard first level OK
        ("$SYS/monitor/+", "$SYS/monitor/Clients", True),
        # exact match, $-topics included
        ("$SYS/broker/load", "$SYS/broker/load", True),
        # multi-machine relay shape used by telemetry_mqtt_wildcard
        ("factory/+/telemetry", "factory/NC_Machine_AC_3/telemetry", True),
        ("factory/+/telemetry", "factory/telemetry", False),
        ("factory/+/telemetry", "factory/a/b/telemetry", False),
    ],
)
def test_topic_matches_spec_table(topic_filter, topic, expect):
    """OASIS MQTT 3.1.1 §4.7 matching semantics, pinned against the
    spec's own examples (the r7 verdict's missing-coverage item)."""
    from real_time_predictive_maintenance_data_pipeline_spark.sources.mqtt_wire import (
        topic_matches,
    )

    assert topic_matches(topic_filter, topic) is expect


@pytest.mark.parametrize(
    ("topic_filter", "expect"),
    [
        ("sport/tennis/#", True),
        ("#", True),
        ("+", True),
        ("+/tennis/#", True),
        ("sport/+/player1", True),
        ("a//b", True),  # empty levels are legal in filters
        ("", False),  # [MQTT-4.7.3-1]: at least one character
        ("sport/tennis#", False),  # '#' must be a whole level
        ("sport/tennis/#/ranking", False),  # '#' must be last
        ("a/#/b", False),
        ("sport+", False),  # '+' must be a whole level
        ("a+", False),
        ("+a/b", False),
    ],
)
def test_valid_topic_filter_table(topic_filter, expect):
    from real_time_predictive_maintenance_data_pipeline_spark.sources.mqtt_wire import (
        valid_topic_filter,
    )

    assert valid_topic_filter(topic_filter) is expect


def test_invalid_filter_gets_suback_failure(broker):
    """Spec §3.9.3: a broker that cannot grant a subscription returns
    0x80 in the SUBACK — and must not route anything to that session."""
    sock = socket.create_connection((broker.host, broker.port), timeout=5)
    stream = PacketStream(sock)
    sock.sendall(encode_connect("bad-filter-sub"))
    assert stream.read_packet(timeout=5).type == CONNACK
    sock.sendall(encode_subscribe(1, "a/#/b", qos=1))
    ack = stream.read_packet(timeout=5)
    assert ack.type == SUBACK and ack.body[2] == 0x80

    pub = MqttPublisher(broker.host, broker.port)
    pub.publish("a/x/b", b"should-not-arrive", qos=1)
    assert stream.read_packet(timeout=1.0) is None  # nothing routed
    pub.close()
    sock.close()


def test_wildcard_subscription_routing_live(broker, tmp_path):
    """One '+' wildcard subscriber sees every per-machine topic, none of
    the non-matching siblings, and no $-topics — over real sockets."""
    sub = SubscriberBridge(
        broker.host, broker.port, "factory/+/telemetry", str(tmp_path / "sp")
    )
    pub = MqttPublisher(broker.host, broker.port)
    delivered = []
    for m in ("m-01", "m-02", "m-03"):
        payload = json.dumps({"machineId": m}).encode()
        pub.publish(f"factory/{m}/telemetry", payload, qos=1)
        delivered.append(payload.decode())
    # none of these match factory/+/telemetry
    pub.publish("factory/telemetry", b'{"machineId":"flat"}', qos=1)
    pub.publish("factory/m-01/telemetry/audit", b'{"machineId":"deep"}', qos=1)
    pub.publish("$SYS/factory/telemetry", b'{"machineId":"sys"}', qos=1)
    deadline = time.time() + 10
    while sub.received < 3 and time.time() < deadline:
        time.sleep(0.05)
    time.sleep(0.3)  # give any mis-routed frame a chance to arrive
    pub.close()
    sub.close()
    got = (tmp_path / "sp" / "mqtt_spool.jsonl").read_text().splitlines()
    assert got == delivered
    assert broker.inflight_count() == 0


def test_overlapping_subscriptions_route_once_per_filter(broker):
    """A session holding BOTH an exact and a wildcard filter matching
    the same topic gets ONE delivery (the broker routes per-session,
    not per-filter) — §3.3.5 allows either; ours picks per-session and
    this test pins that choice."""
    sock = socket.create_connection((broker.host, broker.port), timeout=5)
    stream = PacketStream(sock)
    sock.sendall(encode_connect("overlap-sub"))
    assert stream.read_packet(timeout=5).type == CONNACK
    sock.sendall(encode_subscribe(1, "factory/telemetry", qos=1))
    assert stream.read_packet(timeout=5).type == SUBACK
    sock.sendall(encode_subscribe(2, "factory/#", qos=1))
    assert stream.read_packet(timeout=5).type == SUBACK

    pub = MqttPublisher(broker.host, broker.port)
    pub.publish("factory/telemetry", b"once", qos=1)
    first = stream.read_packet(timeout=5)
    assert first.type == PUBLISH and first.payload == b"once"
    assert stream.read_packet(timeout=0.5) is None  # no duplicate route
    pub.close()
    sock.close()


def test_mqtt_wildcard_catalog_query_routes_exactly(spark):
    """``telemetry_mqtt_wildcard``: every per-machine-topic payload
    arrives through the single wildcard filter; none of the decoy
    topics (flat sibling, deeper level, $SYS) leak into the spool —
    neither as parsed rows nor as quarantined ones."""
    from real_time_predictive_maintenance_data_pipeline_spark.plans import all_queries

    row = all_queries()["telemetry_mqtt_wildcard"].spark(spark, "").first()
    assert row.n_delivered == 300
    assert row.n_quarantined == 0  # a mis-routed decoy would land here
    assert row.n_decoys == 0
    assert row.n_machines >= 1


@settings(max_examples=400, deadline=None)
@given(
    topic=st.lists(
        st.text(alphabet="ab$", min_size=0, max_size=2), min_size=1, max_size=4
    ).map("/".join),
    topic_filter=st.lists(
        st.sampled_from(["a", "b", "ab", "", "+", "#", "$"]),
        min_size=1,
        max_size=4,
    ).map("/".join),
)
def test_topic_matches_against_reference_model(topic, topic_filter):
    """Property check: the production matcher agrees with an
    independently-written recursive model of §4.7 on random
    topic/filter pairs (only syntactically valid filters — '#' last
    level and whole-level wildcards — are compared; the broker rejects
    the rest with SUBACK 0x80 before matching ever runs)."""
    from real_time_predictive_maintenance_data_pipeline_spark.sources.mqtt_wire import (
        topic_matches,
        valid_topic_filter,
    )

    if not valid_topic_filter(topic_filter):
        return

    def model(f_parts, t_parts, first):
        # recursive reference: consume one level at a time
        if not f_parts:
            return not t_parts
        head, rest = f_parts[0], f_parts[1:]
        if head == "#":
            # matches any remainder INCLUDING the parent (zero levels),
            # but a wildcard never matches a $-leading topic
            return not (first and t_parts and t_parts[0].startswith("$"))
        if not t_parts:
            return False
        if head == "+":
            if first and t_parts[0].startswith("$"):
                return False
            return model(rest, t_parts[1:], False)
        return head == t_parts[0] and model(rest, t_parts[1:], False)

    expected = model(topic_filter.split("/"), topic.split("/"), True)
    assert topic_matches(topic_filter, topic) is expected


def test_route_survives_concurrent_subscribes(broker):
    """The r7 advisory race: SUBSCRIBE mutating a session's filter set
    while a publisher's serve thread routes into it could kill that
    serve thread mid-iteration. Hammer both sides concurrently: every
    message published during the subscribe storm must still be routed
    and spooled by the always-subscribed bridge."""
    import threading as _t

    n_msgs = 150
    done = _t.Event()

    def subscribe_storm():
        sock = socket.create_connection((broker.host, broker.port), timeout=5)
        stream = PacketStream(sock)
        sock.sendall(encode_connect("storm-sub"))
        assert stream.read_packet(timeout=5).type == CONNACK
        pid = 1
        while not done.is_set():
            sock.sendall(encode_subscribe(pid, f"storm/{pid}/x", qos=1))
            pkt = stream.read_packet(timeout=5)
            # the storm session may also receive routed PUBLISHes for
            # earlier filters; ack and keep draining until the SUBACK
            while pkt is not None and pkt.type != SUBACK:
                pkt = stream.read_packet(timeout=5)
            pid = pid % 0xFFFF + 1
        sock.close()

    storm = _t.Thread(target=subscribe_storm, daemon=True)
    storm.start()
    pub = MqttPublisher(broker.host, broker.port)
    raw_sub = socket.create_connection((broker.host, broker.port), timeout=5)
    raw_stream = PacketStream(raw_sub)
    raw_sub.sendall(encode_connect("steady-sub"))
    assert raw_stream.read_packet(timeout=5).type == CONNACK
    raw_sub.sendall(encode_subscribe(1, "storm/+/x", qos=1))
    assert raw_stream.read_packet(timeout=5).type == SUBACK
    try:
        got = 0
        from real_time_predictive_maintenance_data_pipeline_spark.sources.mqtt_wire import (
            encode_puback,
        )

        for i in range(n_msgs):
            pub.publish(f"storm/{i % 7}/x", f"m{i}".encode(), qos=1)
            # drain this subscriber so its socket buffer never fills
            pkt = raw_stream.read_packet(timeout=5)
            while pkt is not None:
                if pkt.type == PUBLISH:
                    got += 1
                    if pkt.packet_id is not None:
                        raw_sub.sendall(encode_puback(pkt.packet_id))
                    break
                pkt = raw_stream.read_packet(timeout=5)
    finally:
        done.set()
        storm.join(timeout=10)
        pub.close()
        raw_sub.close()
    # every publish survived the storm: no serve thread died routing
    assert got == n_msgs


def test_unsubscribe_stops_delivery_exact_filter_only(broker):
    """§3.10: UNSUBSCRIBE removes a subscription by exact filter-string
    comparison and is acknowledged with UNSUBACK. Messages published
    after the unsubscribe must not route; a different filter that
    happens to match the same topics is untouched."""
    from real_time_predictive_maintenance_data_pipeline_spark.sources.mqtt_wire import (
        UNSUBACK,
        encode_puback,
        encode_unsubscribe,
    )

    sock = socket.create_connection((broker.host, broker.port), timeout=5)
    stream = PacketStream(sock)
    sock.sendall(encode_connect("unsub-test"))
    assert stream.read_packet(timeout=5).type == CONNACK
    sock.sendall(encode_subscribe(1, "factory/+/telemetry", qos=1))
    assert stream.read_packet(timeout=5).type == SUBACK
    sock.sendall(encode_subscribe(2, "factory/m1/telemetry", qos=1))
    assert stream.read_packet(timeout=5).type == SUBACK

    pub = MqttPublisher(broker.host, broker.port)
    pub.publish("factory/m1/telemetry", b"before", qos=1)
    got = stream.read_packet(timeout=5)
    assert got.type == PUBLISH and got.payload == b"before"
    sock.sendall(encode_puback(got.packet_id))

    # remove ONLY the wildcard filter; the exact filter stays live
    sock.sendall(encode_unsubscribe(3, "factory/+/telemetry"))
    ack = stream.read_packet(timeout=5)
    assert ack.type == UNSUBACK and ack.packet_id == 3

    pub.publish("factory/m2/telemetry", b"wild-only", qos=1)  # now unmatched
    pub.publish("factory/m1/telemetry", b"exact-still", qos=1)
    nxt = stream.read_packet(timeout=5)
    assert nxt.type == PUBLISH and nxt.payload == b"exact-still"
    sock.sendall(encode_puback(nxt.packet_id))
    assert stream.read_packet(timeout=0.5) is None  # wild-only never arrived

    # removing the last filter silences the session entirely; UNSUBACK
    # still comes back even for a not-subscribed filter (spec MUST)
    sock.sendall(encode_unsubscribe(4, "factory/m1/telemetry", "never/was"))
    ack = stream.read_packet(timeout=5)
    assert ack.type == UNSUBACK and ack.packet_id == 4
    pub.publish("factory/m1/telemetry", b"after", qos=1)
    assert stream.read_packet(timeout=0.5) is None
    pub.close()
    sock.close()


def test_unsubscribe_codec_roundtrip():
    from real_time_predictive_maintenance_data_pipeline_spark.sources.mqtt_wire import (
        UNSUBSCRIBE,
        encode_unsubscribe,
        parse_packet,
    )

    raw = encode_unsubscribe(77, "a/+/b", "#")
    pkt, used = parse_packet(raw)
    assert used == len(raw)
    assert pkt.type == UNSUBSCRIBE and pkt.flags == 0x02
    assert pkt.packet_id == 77
    # payload after the packet id is the two length-prefixed filters
    assert pkt.body[2:] == b"\x00\x05a/+/b\x00\x01#"


# ---------------------------------------------------------------------------
# Connection-loss recovery (loop_forever parity, realtime_inference.py:189)
# ---------------------------------------------------------------------------


def _wait_until(pred, timeout=10.0):
    deadline = time.time() + timeout
    while not pred() and time.time() < deadline:
        time.sleep(0.05)
    return pred()


def test_subscriber_reconnects_after_connection_drop(broker, tmp_path):
    """Severed transport auto-recovers: redial + re-subscribe, then keep
    spooling — paho ``loop_forever`` semantics. The second batch rides a
    FRESH broker session whose packet ids restart at 1, so it also
    proves the per-session dedup set resets (a stale set would silently
    drop every post-reconnect message)."""
    sub = SubscriberBridge(broker.host, broker.port, TOPIC, str(tmp_path / "sp"))
    pub = MqttPublisher(broker.host, broker.port)
    for i in range(3):
        pub.publish(TOPIC, f"pre-{i}".encode(), qos=1)
    pub.close()
    assert _wait_until(lambda: sub.received == 3)
    # the publisher's DISCONNECT is processed asynchronously — wait for
    # its session to go away so the drop below is deterministic
    assert _wait_until(lambda: broker.session_count() == 1)

    assert broker.drop_connections() == 1  # only the subscriber session
    assert _wait_until(lambda: sub.reconnects >= 1)
    assert _wait_until(lambda: broker.session_count() == 1)

    pub = MqttPublisher(broker.host, broker.port)
    for i in range(3):
        pub.publish(TOPIC, f"post-{i}".encode(), qos=1)
    pub.close()
    assert _wait_until(lambda: sub.received == 6)
    sub.close()  # must not raise: loss was recovered, not an error
    lines = (tmp_path / "sp" / "mqtt_spool.jsonl").read_text().splitlines()
    assert lines == [f"pre-{i}" for i in range(3)] + [f"post-{i}" for i in range(3)]


def test_subscriber_reconnect_disabled_surfaces_loss(broker, tmp_path):
    """With ``reconnect=False`` a severed connection is an ERROR the
    caller hears about at close(), never a silent stall."""
    sub = SubscriberBridge(
        broker.host, broker.port, TOPIC, str(tmp_path / "sp"), reconnect=False
    )
    broker.drop_connections()
    assert _wait_until(lambda: sub._error is not None)
    with pytest.raises(RuntimeError, match="subscriber thread died"):
        sub.close()


def test_connect_aborts_when_close_raced_the_dial(broker, tmp_path):
    """close() joins the loop thread with a timeout SHORTER than the
    connect timeout, so a reconnect attempt can still be mid-dial when
    close() returns. _connect must then refuse to install the fresh
    session (it would leak until process exit — nobody reads or
    DISCONNECTs it): with _stop set, it closes the just-dialed socket
    and raises, and the reconnect loop observes _stop and gives up."""
    sub = SubscriberBridge(broker.host, broker.port, TOPIC, str(tmp_path / "sp"))
    assert _wait_until(lambda: broker.session_count() == 1)
    sub._stop.set()  # what close() does before the join
    with pytest.raises(ConnectionError, match="closing"):
        sub._connect()
    # the aborted session's socket was closed -> broker reaps it; only
    # the bridge's original session remains
    assert _wait_until(lambda: broker.session_count() == 1)
    sub.close()


def test_subscriber_reconnect_survives_broker_outage(tmp_path):
    """The backoff loop outlives a full broker restart on the same
    port: every redial fails while the broker is down, then the first
    successful one re-subscribes and delivery resumes."""
    broker = MiniBroker()
    port = broker.port
    sub = SubscriberBridge(broker.host, port, TOPIC, str(tmp_path / "sp"))
    try:
        broker.close()  # outage: connection severed AND nothing listening
        assert _wait_until(lambda: sub._stream.eof or sub.reconnects >= 1)
        broker = MiniBroker(port=port)
        assert _wait_until(lambda: sub.reconnects >= 1)
        pub = MqttPublisher(broker.host, broker.port)
        pub.publish(TOPIC, b"after-outage", qos=1)
        pub.close()
        assert _wait_until(lambda: sub.received == 1)
        sub.close()
    finally:
        broker.close()


def test_broker_reaps_dead_sessions(broker):
    """A client vanishing WITHOUT DISCONNECT (crash/partition) is
    reaped: its serve thread exits instead of spinning on instant-EOF
    recv, and routing stops targeting the dead socket."""
    raw = socket.create_connection((broker.host, broker.port), timeout=5)
    raw.sendall(encode_connect("abrupt-client"))
    stream = PacketStream(raw)
    ack = stream.read_packet(timeout=5)
    assert ack is not None and ack.type == CONNACK
    assert _wait_until(lambda: broker.session_count() == 1)
    raw.close()  # no DISCONNECT frame
    assert _wait_until(lambda: broker.session_count() == 0)


def test_packet_stream_eof_is_latched():
    """eof distinguishes a dead socket from a quiet one — and stays
    False across ordinary timeouts."""
    a, b = socket.socketpair()
    stream = PacketStream(a)
    assert stream.read_packet(timeout=0.05) is None  # quiet, not dead
    assert stream.eof is False
    b.sendall(encode_connect("c1"))
    pkt = stream.read_packet(timeout=1.0)
    assert pkt is not None
    b.close()
    assert stream.read_packet(timeout=1.0) is None
    assert stream.eof is True
    a.close()


def test_subscriber_keepalive_pings_when_idle(broker, tmp_path):
    """§3.1.2.10: within each keepalive interval the client must send
    SOME control packet or a real broker drops it at 1.5x keepalive —
    an idle subscriber pings at half the advertised interval and the
    session stays usable afterwards."""
    sub = SubscriberBridge(
        broker.host, broker.port, TOPIC, str(tmp_path / "sp"), keepalive=1
    )
    assert _wait_until(lambda: sub.pings_sent >= 2, timeout=5.0)
    assert broker.session_count() == 1  # broker answered, nothing died
    pub = MqttPublisher(broker.host, broker.port)
    pub.publish(TOPIC, b"after-idle", qos=1)
    pub.close()
    assert _wait_until(lambda: sub.received == 1)
    assert sub.reconnects == 0  # liveness came from pings, not redials
    sub.close()


@settings(max_examples=60, deadline=None)
@given(data=st.data())
def test_packet_stream_reassembles_arbitrary_fragmentation(data):
    """TCP is a byte stream: a sequence of MQTT frames may arrive split
    at ANY byte boundary (or coalesced). The framer must reassemble the
    identical packet sequence regardless of fragmentation."""
    from real_time_predictive_maintenance_data_pipeline_spark.sources.mqtt_wire import (
        encode_connack,
        encode_disconnect,
        encode_pingreq,
        encode_pingresp,
        encode_puback,
        encode_suback,
        encode_unsubscribe,
    )

    frame_strategy = st.one_of(
        st.builds(encode_connect, st.text(min_size=1, max_size=10)),
        st.builds(encode_connack),
        st.builds(
            encode_publish,
            st.text(min_size=1, max_size=10).filter(lambda t: "\x00" not in t),
            st.binary(max_size=300),
            st.just(1),
            st.integers(min_value=1, max_value=0xFFFF),
        ),
        st.builds(encode_puback, st.integers(min_value=1, max_value=0xFFFF)),
        st.builds(
            encode_subscribe, st.integers(min_value=1, max_value=0xFFFF),
            st.text(min_size=1, max_size=10).filter(lambda t: "\x00" not in t),
        ),
        st.builds(encode_suback, st.integers(min_value=1, max_value=0xFFFF)),
        st.builds(
            encode_unsubscribe, st.integers(min_value=1, max_value=0xFFFF),
            st.text(min_size=1, max_size=10).filter(lambda t: "\x00" not in t),
        ),
        st.builds(encode_pingreq),
        st.builds(encode_pingresp),
        st.builds(encode_disconnect),
    )
    frames = data.draw(st.lists(frame_strategy, min_size=1, max_size=6))
    blob = b"".join(frames)
    # arbitrary cut points, including empty-chunk degenerate splits
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=len(blob)), max_size=12
            )
        )
    )
    a, b = socket.socketpair()
    try:
        pos = 0
        for c in cuts + [len(blob)]:
            if c > pos:
                b.sendall(blob[pos:c])
            pos = c
        stream = PacketStream(a)
        got = [stream.read_packet(timeout=2.0) for _ in frames]
    finally:
        a.close()
        b.close()
    expected = [parse_packet(f)[0] for f in frames]
    assert [
        (p.type, p.packet_id, getattr(p, "topic", None), getattr(p, "payload", None))
        for p in got
    ] == [
        (p.type, p.packet_id, getattr(p, "topic", None), getattr(p, "payload", None))
        for p in expected
    ]


def test_publisher_fails_fast_when_connection_dies(broker):
    """A publisher whose connection is severed mid-session raises a
    clear ConnectionError on the next QoS-1 publish instead of DUP
    re-sending into the dead socket until the retry budget burns —
    the Spark task retry is the recovery path."""
    pub = MqttPublisher(broker.host, broker.port)
    pub.publish(TOPIC, b"while-alive", qos=1)
    broker.drop_connections()
    with pytest.raises((ConnectionError, OSError)):
        deadline = time.time() + 5
        while time.time() < deadline:
            pub.publish(TOPIC, b"into-the-void", qos=1)
            time.sleep(0.05)
    pub.close()
