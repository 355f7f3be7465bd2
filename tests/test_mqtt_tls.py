"""O8 — mutual-TLS socket factory for the MQTT transport.

Reference parity: the simulator builds an SSLSocketFactory from three
PEM files — root CA (trust store), device certificate, private key —
and connects to port 8883 (AwsIotSslUtil.java:54-66,
IoTSimulator.java:79-82,121); the inference side mirrors it with
``tls_set(ca, cert, key, cert_reqs=CERT_REQUIRED,
PROTOCOL_TLS_CLIENT)`` + ``tls_insecure_set(False)``
(realtime_inference.py:152-162,179). These tests mint a CA + server +
device certificates at runtime and run the same QoS-1 MQTT loop with
every frame inside mutual TLS — including the two rejection paths AWS
IoT enforces: no client certificate, and a certificate from a foreign
CA.

Requires the ``cryptography`` package only to MINT certificates; the
engine's TLS code itself is stdlib ``ssl``.
"""

from __future__ import annotations

import json
import socket
import ssl
import time

import pytest

cryptography = pytest.importorskip("cryptography")

from real_time_predictive_maintenance_data_pipeline_spark.sources.mqtt_certs import (
    mint_dev_certs,
    mint_keypair,
    pem_cert,
    pem_key,
)
from real_time_predictive_maintenance_data_pipeline_spark.sources.mqtt_wire import (
    MiniBroker,
    MqttPublisher,
    SubscriberBridge,
    client_tls_context,
    publish_partitions,
    server_tls_context,
)

TOPIC = "factory/telemetry"


@pytest.fixture(scope="module")
def certs(tmp_path_factory):
    """PEM files on disk, exactly the reference's three-file layout
    (IoTSimulator.java:80-82) plus a rogue CA for the rejection path."""
    d = tmp_path_factory.mktemp("certs")
    paths = mint_dev_certs(str(d))
    rogue_ca_key, rogue_ca_cert = mint_keypair("rogue-ca", ca=True)
    rogue_key, rogue_cert = mint_keypair(
        "device-evil", issuer_cert=rogue_ca_cert, issuer_key=rogue_ca_key
    )
    for name, data in {
        "rogue_ca.pem": pem_cert(rogue_ca_cert),
        "rogue.pem.crt": pem_cert(rogue_cert),
        "rogue.pem.key": pem_key(rogue_key),
    }.items():
        p = d / name
        p.write_bytes(data)
        paths[name] = str(p)
    return paths


@pytest.fixture()
def tls_broker(certs):
    b = MiniBroker(
        tls=server_tls_context(
            certs["root_ca.pem"], certs["server.pem.crt"], certs["server.pem.key"]
        )
    )
    yield b
    b.close()


def _client_ctx(certs):
    return client_tls_context(
        certs["root_ca.pem"],
        certs["certificate.pem.crt"],
        certs["private.pem.key"],
    )


def test_qos1_loop_over_mutual_tls(tls_broker, certs, tmp_path):
    """The full publish → broker → subscribe → spool loop with every
    MQTT frame inside mutual TLS — the reference's port-8883 shape."""
    sub = SubscriberBridge(
        tls_broker.host,
        tls_broker.port,
        TOPIC,
        str(tmp_path / "spool"),
        tls=_client_ctx(certs),
    )
    pub = MqttPublisher(tls_broker.host, tls_broker.port, tls=_client_ctx(certs))
    payloads = [
        json.dumps({"machineId": f"m-{i}", "temperature": 60.0 + i})
        for i in range(10)
    ]
    for p in payloads:
        assert pub.publish(TOPIC, p.encode(), qos=1) == 1
    deadline = time.time() + 10
    while sub.received < len(payloads) and time.time() < deadline:
        time.sleep(0.05)
    pub.close()
    sub.close()
    assert sub.received == len(payloads)
    got = (tmp_path / "spool" / "mqtt_spool.jsonl").read_text().splitlines()
    assert got == payloads
    assert tls_broker.inflight_count() == 0


def test_certless_client_rejected(tls_broker, certs):
    """CERT_REQUIRED on the broker: a TLS client presenting no
    certificate never completes the handshake (AWS IoT device-auth)."""
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
    ctx.load_verify_locations(cafile=certs["root_ca.pem"])  # trusts server, no identity
    with pytest.raises((ssl.SSLError, ConnectionError, OSError)):
        raw = socket.create_connection((tls_broker.host, tls_broker.port), timeout=5)
        tls = ctx.wrap_socket(raw, server_hostname=tls_broker.host)
        # TLS 1.3 reports the missing client cert on first read
        tls.settimeout(5)
        if tls.recv(1) == b"":
            raise ConnectionError("server closed: client cert required")


def test_foreign_ca_client_rejected(tls_broker, certs):
    """A client certificate chaining to a DIFFERENT CA fails mutual
    auth — possession of any cert is not enough, it must be OUR CA's."""
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
    ctx.load_verify_locations(cafile=certs["root_ca.pem"])
    ctx.load_cert_chain(certs["rogue.pem.crt"], certs["rogue.pem.key"])
    with pytest.raises((ssl.SSLError, ConnectionError, OSError)):
        raw = socket.create_connection((tls_broker.host, tls_broker.port), timeout=5)
        tls = ctx.wrap_socket(raw, server_hostname=tls_broker.host)
        tls.settimeout(5)
        if tls.recv(1) == b"":
            raise ConnectionError("server closed: unknown client CA")


def test_server_cert_verified_by_client(certs):
    """check_hostname + CERT_REQUIRED on the client: a broker whose
    certificate is NOT signed by the trusted root CA is refused by the
    publisher (tls_insecure_set(False) semantics)."""
    rogue_broker = MiniBroker(
        tls=server_tls_context(
            certs["root_ca.pem"], certs["rogue.pem.crt"], certs["rogue.pem.key"]
        )
    )
    try:
        with pytest.raises((ssl.SSLError, ConnectionError, OSError)):
            MqttPublisher(
                rogue_broker.host, rogue_broker.port, tls=_client_ctx(certs)
            )
    finally:
        rogue_broker.close()


def test_broker_keeps_serving_after_failed_handshakes(tls_broker, certs, tmp_path):
    """Failed mutual auth costs only that connection: a proper client
    connecting right after two rejected ones works normally."""
    for _ in range(2):
        try:
            ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
            ctx.check_hostname = False
            ctx.verify_mode = ssl.CERT_NONE
            raw = socket.create_connection(
                (tls_broker.host, tls_broker.port), timeout=5
            )
            tls = ctx.wrap_socket(raw)
            tls.settimeout(2)
            tls.recv(1)
            tls.close()
        except (ssl.SSLError, OSError):
            pass
    sub = SubscriberBridge(
        tls_broker.host,
        tls_broker.port,
        TOPIC,
        str(tmp_path / "sp"),
        tls=_client_ctx(certs),
    )
    pub = MqttPublisher(tls_broker.host, tls_broker.port, tls=_client_ctx(certs))
    pub.publish(TOPIC, b"still-alive", qos=1)
    deadline = time.time() + 5
    while sub.received < 1 and time.time() < deadline:
        time.sleep(0.05)
    assert sub.received == 1
    pub.close()
    sub.close()


def test_distributed_publish_over_mtls(spark, tls_broker, certs, tmp_path):
    """O7+O8 together: per-partition QoS-1 publishers handshake mutual
    TLS on the executors (PEM PATHS serialize; each partition builds
    its own SSLContext) — the distributed shape of the reference's
    single socketFactory client."""
    sub = SubscriberBridge(
        tls_broker.host,
        tls_broker.port,
        TOPIC,
        str(tmp_path / "spool"),
        tls=_client_ctx(certs),
    )
    n = 40
    df = spark.range(n).selectExpr("format_string('{\"i\":%d}', id) AS value")
    publish_partitions(
        df.repartition(4),
        tls_broker.host,
        tls_broker.port,
        TOPIC,
        tls_paths=(
            certs["root_ca.pem"],
            certs["certificate.pem.crt"],
            certs["private.pem.key"],
        ),
    )
    deadline = time.time() + 30
    while sub.received < n and time.time() < deadline:
        time.sleep(0.05)
    sub.close()
    assert sub.received == n
    got = sorted(
        json.loads(line)["i"]
        for line in (tmp_path / "spool" / "mqtt_spool.jsonl").read_text().splitlines()
    )
    assert got == list(range(n))


def test_mint_dev_certs_layout(tmp_path):
    """mint_dev_certs writes the reference's three-file client bundle
    plus a broker pair, and both TLS contexts load from those paths
    directly (the example's --tls wiring)."""
    paths = mint_dev_certs(str(tmp_path / "dev"))
    assert set(paths) == {
        "root_ca.pem",
        "certificate.pem.crt",
        "private.pem.key",
        "server.pem.crt",
        "server.pem.key",
    }
    for p in paths.values():
        head = open(p, "rb").read(30)
        assert head.startswith(b"-----BEGIN ")
    # both factories accept the minted files as-is
    client_tls_context(
        paths["root_ca.pem"], paths["certificate.pem.crt"], paths["private.pem.key"]
    )
    server_tls_context(
        paths["root_ca.pem"], paths["server.pem.crt"], paths["server.pem.key"]
    )


def test_private_keys_not_world_readable(tmp_path):
    """Minted PRIVATE keys must be owner-only (0600) even under a
    permissive umask — the example writes them into a shared tmp dir.
    Certificates are public material and keep default permissions.
    Re-minting over an existing world-readable file must tighten it."""
    import os
    import stat

    d = str(tmp_path / "dev")
    paths = mint_dev_certs(d)
    for name, p in paths.items():
        mode = stat.S_IMODE(os.stat(p).st_mode)
        if name.endswith(".key"):
            assert mode == 0o600, (name, oct(mode))
        else:
            assert mode & stat.S_IRUSR  # certs stay readable
    # loosen a key by hand, re-mint: mode must come back to 0600
    os.chmod(paths["private.pem.key"], 0o644)
    paths = mint_dev_certs(d)
    assert stat.S_IMODE(os.stat(paths["private.pem.key"]).st_mode) == 0o600
