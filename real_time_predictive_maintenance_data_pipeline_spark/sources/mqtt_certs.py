"""Development X.509 certificate minting for the mTLS transport (O8).

The reference consumes a provisioned three-file PEM layout — root CA,
device certificate, device private key (``IoTSimulator.java:80-82``,
``realtime_inference.py:152-162``) — but provisioning happens outside
its repo (AWS IoT device registry). For local development and tests of
the engine's mTLS socket factory (``mqtt_wire.client_tls_context`` /
``server_tls_context``) this module mints an equivalent layout at
runtime: a self-signed root CA, a server certificate (CN/SAN
``127.0.0.1``/``localhost``) and a device certificate, all signed by
that CA.

Requires the ``cryptography`` package; import is deferred so the rest
of the MQTT transport works without it (mint functions raise a clear
``ImportError`` when it is absent).
"""

from __future__ import annotations

import datetime
import ipaddress
import os


def _x509():
    try:
        from cryptography import x509
        from cryptography.hazmat.primitives import hashes, serialization
        from cryptography.hazmat.primitives.asymmetric import ec
        from cryptography.x509.oid import NameOID
    except ImportError as e:  # pragma: no cover - present in dev images
        raise ImportError(
            "mqtt_certs needs the 'cryptography' package to mint dev "
            "certificates; provide provisioned PEM files instead"
        ) from e
    return x509, hashes, serialization, ec, NameOID


def mint_keypair(
    cn: str,
    issuer_cert=None,
    issuer_key=None,
    ca: bool = False,
    san_localhost: bool = False,
    days: int = 1,
):
    """Return ``(private_key, certificate)`` for ``cn``.

    Self-signed when no issuer is given (pass ``ca=True`` for a root
    CA); otherwise signed by ``issuer_key`` with ``issuer_cert``'s
    subject as the issuer name. ``san_localhost`` adds the
    ``localhost``/``127.0.0.1`` SubjectAlternativeName a server
    certificate needs to pass client-side hostname checking.
    """
    x509, hashes, _, ec, NameOID = _x509()
    key = ec.generate_private_key(ec.SECP256R1())
    subject = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, cn)])
    now = datetime.datetime.now(datetime.timezone.utc)
    builder = (
        x509.CertificateBuilder()
        .subject_name(subject)
        .issuer_name(issuer_cert.subject if issuer_cert is not None else subject)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now - datetime.timedelta(minutes=5))
        .not_valid_after(now + datetime.timedelta(days=days))
        .add_extension(x509.BasicConstraints(ca=ca, path_length=None), critical=True)
    )
    if san_localhost:
        builder = builder.add_extension(
            x509.SubjectAlternativeName(
                [
                    x509.DNSName("localhost"),
                    x509.IPAddress(ipaddress.ip_address("127.0.0.1")),
                ]
            ),
            critical=False,
        )
    cert = builder.sign(issuer_key if issuer_key is not None else key, hashes.SHA256())
    return key, cert


def pem_key(key) -> bytes:
    """Serialize a private key as unencrypted PKCS#8 PEM (the format
    the reference's key loader handles natively, AwsIotSslUtil.java:163-167)."""
    _, _, serialization, _, _ = _x509()
    return key.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.PKCS8,
        serialization.NoEncryption(),
    )


def pem_cert(cert) -> bytes:
    _, _, serialization, _, _ = _x509()
    return cert.public_bytes(serialization.Encoding.PEM)


def mint_dev_certs(out_dir: str, server_cn: str = "127.0.0.1") -> dict[str, str]:
    """Mint the reference's three-file client layout plus a broker pair
    into ``out_dir`` and return ``{filename: path}``.

    Files written (names follow AWS IoT's download bundle, which the
    reference's config points at — ``IoTSimulator.java:80-82``):

    - ``root_ca.pem`` — the trust anchor both sides verify against
    - ``certificate.pem.crt`` / ``private.pem.key`` — device identity
    - ``server.pem.crt`` / ``server.pem.key`` — broker identity
      (CA-signed, SAN ``localhost``/``127.0.0.1``)

    Feed the first three to ``client_tls_context`` (or
    ``publish_partitions(tls_paths=...)``) and the broker pair plus the
    CA to ``server_tls_context`` for a fully mutual-TLS loop.
    """
    os.makedirs(out_dir, exist_ok=True)
    ca_key, ca_cert = mint_keypair("rtpmdp-root-ca", ca=True)
    srv_key, srv_cert = mint_keypair(
        server_cn, issuer_cert=ca_cert, issuer_key=ca_key, san_localhost=True
    )
    dev_key, dev_cert = mint_keypair(
        "device-001", issuer_cert=ca_cert, issuer_key=ca_key
    )
    paths: dict[str, str] = {}
    for name, data in {
        "root_ca.pem": pem_cert(ca_cert),
        "certificate.pem.crt": pem_cert(dev_cert),
        "private.pem.key": pem_key(dev_key),
        "server.pem.crt": pem_cert(srv_cert),
        "server.pem.key": pem_key(srv_key),
    }.items():
        p = os.path.join(out_dir, name)
        if name.endswith(".key"):
            # private keys must not be world-readable even in dev runs —
            # the example writes into a shared tmp dir. O_TRUNC keeps
            # re-minting over an existing file working; the mode applies
            # only at create time, so chmod unconditionally too.
            fd = os.open(p, os.O_WRONLY | os.O_CREAT | os.O_TRUNC, 0o600)
            with os.fdopen(fd, "wb") as f:
                f.write(data)
            os.chmod(p, 0o600)
        else:
            with open(p, "wb") as f:
                f.write(data)
        paths[name] = p
    return paths
