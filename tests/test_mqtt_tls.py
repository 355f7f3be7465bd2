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

import datetime
import json
import socket
import ssl
import time

import pytest

cryptography = pytest.importorskip("cryptography")

from cryptography import x509
from cryptography.hazmat.primitives import hashes, serialization
from cryptography.hazmat.primitives.asymmetric import ec
from cryptography.x509.oid import NameOID

from real_time_predictive_maintenance_data_pipeline_spark.sources.mqtt_wire import (
    MiniBroker,
    MqttPublisher,
    SubscriberBridge,
    client_tls_context,
    publish_partitions,
    server_tls_context,
)

TOPIC = "factory/telemetry"


def _name(cn: str) -> x509.Name:
    return x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, cn)])


def _mint(
    cn: str,
    issuer_name: x509.Name | None = None,
    issuer_key=None,
    ca: bool = False,
    san: bool = False,
):
    """Return (key, cert). Self-signed when no issuer is given."""
    key = ec.generate_private_key(ec.SECP256R1())
    subject = _name(cn)
    now = datetime.datetime.now(datetime.timezone.utc)
    builder = (
        x509.CertificateBuilder()
        .subject_name(subject)
        .issuer_name(issuer_name if issuer_name is not None else subject)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now - datetime.timedelta(minutes=5))
        .not_valid_after(now + datetime.timedelta(days=1))
        .add_extension(x509.BasicConstraints(ca=ca, path_length=None), critical=True)
    )
    if san:
        builder = builder.add_extension(
            x509.SubjectAlternativeName(
                [
                    x509.DNSName("localhost"),
                    x509.IPAddress(__import__("ipaddress").ip_address("127.0.0.1")),
                ]
            ),
            critical=False,
        )
    cert = builder.sign(issuer_key if issuer_key is not None else key, hashes.SHA256())
    return key, cert


def _pem_key(key) -> bytes:
    return key.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.PKCS8,
        serialization.NoEncryption(),
    )


def _pem_cert(cert) -> bytes:
    return cert.public_bytes(serialization.Encoding.PEM)


@pytest.fixture(scope="module")
def certs(tmp_path_factory):
    """PEM files on disk, exactly the reference's three-file layout
    (IoTSimulator.java:80-82) plus a rogue CA for the rejection path."""
    d = tmp_path_factory.mktemp("certs")
    ca_key, ca_cert = _mint("rtpmdp-root-ca", ca=True)
    srv_key, srv_cert = _mint(
        "127.0.0.1", issuer_name=ca_cert.subject, issuer_key=ca_key, san=True
    )
    dev_key, dev_cert = _mint(
        "device-001", issuer_name=ca_cert.subject, issuer_key=ca_key
    )
    rogue_ca_key, rogue_ca_cert = _mint("rogue-ca", ca=True)
    rogue_key, rogue_cert = _mint(
        "device-evil", issuer_name=rogue_ca_cert.subject, issuer_key=rogue_ca_key
    )
    paths = {}
    for name, data in {
        "root_ca.pem": _pem_cert(ca_cert),
        "server.pem.crt": _pem_cert(srv_cert),
        "server.pem.key": _pem_key(srv_key),
        "certificate.pem.crt": _pem_cert(dev_cert),
        "private.pem.key": _pem_key(dev_key),
        "rogue_ca.pem": _pem_cert(rogue_ca_cert),
        "rogue.pem.crt": _pem_cert(rogue_cert),
        "rogue.pem.key": _pem_key(rogue_key),
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
