"""SCRAM-SHA-256 client (RFC 5802 / RFC 7677), stdlib-only.

The reference inherits SCRAM from the ``pg`` driver it delegates
connections to (``src/logical-replication-service.ts:5-7`` /
``:70-87`` — ``ReplicationClientConfig`` is a plain ``pg``
``ClientConfig``); this engine speaks the PostgreSQL v3 protocol itself
(``sources/transport.py``), so the SASL exchange is implemented here
from the public RFCs + the PG docs
(postgresql.org/docs/current/sasl-authentication.html):

    AuthenticationSASL (code 10, mechanism list)
      → SASLInitialResponse  (mechanism + ``n,,n=,r=<client-nonce>``)
    AuthenticationSASLContinue (code 11, ``r=…,s=…,i=…``)
      → SASLResponse         (``c=biws,r=…,p=<proof>``)
    AuthenticationSASLFinal (code 12, ``v=<server-signature>``)
      → client VERIFIES the server signature (mutual auth — a server
        that doesn't know the password fails here, not silently)

PostgreSQL ≥ 14 defaults ``password_encryption = scram-sha-256``, so
this is the auth method a stock modern server demands. Channel binding
(``SCRAM-SHA-256-PLUS``, RFC 5802 §6 gs2 + RFC 5929
``tls-server-end-point``) IS implemented: pass ``channel_binding=``
the server-certificate hash from :func:`cert_cb_data` and the client
sends the ``p=tls-server-end-point,,`` gs2 header with
``c=base64(gs2 || cb-data)`` — what an HBA line demanding
``scram-sha-256-plus`` (or a MITM-paranoid deployment) requires. On a
TLS connection where the server offers only the plain mechanism, the
client sends the ``y`` gs2 flag ("I support channel binding but you
did not advertise it") so a genuine server that DID advertise -PLUS
detects the downgrade, per RFC 5802 §7.

Crypto is stdlib: ``hashlib.pbkdf2_hmac`` for the salted password,
``hmac`` for the key/signature chain. No SASLprep normalization is
applied (ASCII passwords — the overwhelmingly common case — are
unaffected; non-ASCII passwords raise to avoid silent mismatches).
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import secrets

GS2_HEADER = "n,,"  # no channel binding
_CBIND = base64.b64encode(GS2_HEADER.encode()).decode()  # "biws"
GS2_HEADER_Y = "y,,"  # client supports CB; server did not offer -PLUS
GS2_HEADER_PLUS = "p=tls-server-end-point,,"


# RFC 5280 signatureAlgorithm OIDs → the hash RFC 5929 §4.1 prescribes
# for tls-server-end-point (MD5 and SHA-1 are upgraded to SHA-256).
_SIG_OID_HASH = {
    "1.2.840.113549.1.1.4": "sha256",  # md5WithRSAEncryption → sha256
    "1.2.840.113549.1.1.5": "sha256",  # sha1WithRSAEncryption → sha256
    "1.2.840.113549.1.1.11": "sha256",  # sha256WithRSAEncryption
    "1.2.840.113549.1.1.12": "sha384",  # sha384WithRSAEncryption
    "1.2.840.113549.1.1.13": "sha512",  # sha512WithRSAEncryption
    "1.2.840.10045.4.1": "sha256",  # ecdsa-with-SHA1 → sha256
    "1.2.840.10045.4.3.2": "sha256",  # ecdsa-with-SHA256
    "1.2.840.10045.4.3.3": "sha384",  # ecdsa-with-SHA384
    "1.2.840.10045.4.3.4": "sha512",  # ecdsa-with-SHA512
    "1.3.101.112": "sha512",  # Ed25519 (no inner hash; SHA-512 family)
}


def _der_element(buf: bytes, pos: int) -> tuple[int, int, int]:
    """One DER TLV at ``pos`` → (tag, content_start, content_end)."""
    tag = buf[pos]
    ln = buf[pos + 1]
    pos += 2
    if ln & 0x80:
        n = ln & 0x7F
        ln = int.from_bytes(buf[pos : pos + n], "big")
        pos += n
    return tag, pos, pos + ln


def _decode_oid(content: bytes) -> str:
    out = [str(content[0] // 40), str(content[0] % 40)]
    val = 0
    for b in content[1:]:
        val = (val << 7) | (b & 0x7F)
        if not b & 0x80:
            out.append(str(val))
            val = 0
    return ".".join(out)


def cert_cb_data(cert_der: bytes) -> bytes:
    """RFC 5929 ``tls-server-end-point`` channel-binding data: the hash
    of the server certificate, using the hash of its OWN
    signatureAlgorithm (MD5/SHA-1 upgraded to SHA-256). The
    signatureAlgorithm sits in a fixed spot of the public X.509 DER
    layout (RFC 5280 §4.1: Certificate ::= SEQUENCE { tbsCertificate,
    signatureAlgorithm AlgorithmIdentifier, signatureValue }), so a
    three-step stdlib DER walk reads it without an ASN.1 library;
    unknown algorithms fall back to SHA-256 — the choice every major
    PG driver makes."""
    algo = "sha256"
    try:
        _, start, _ = _der_element(cert_der, 0)  # Certificate SEQUENCE
        _, tbs_start, tbs_end = _der_element(cert_der, start)
        _, alg_start, _ = _der_element(cert_der, tbs_end)  # AlgorithmId
        tag, oid_start, oid_end = _der_element(cert_der, alg_start)
        if tag == 0x06:  # OBJECT IDENTIFIER
            algo = _SIG_OID_HASH.get(
                _decode_oid(cert_der[oid_start:oid_end]), "sha256"
            )
    except (IndexError, ValueError):  # malformed DER: keep the default
        pass
    return hashlib.new(algo, cert_der).digest()


def _attrs(message: str) -> dict[str, str]:
    """Parse ``k=v,k=v`` SCRAM attribute lists (values may contain '=')."""
    out: dict[str, str] = {}
    for part in message.split(","):
        if "=" in part:
            k, v = part.split("=", 1)
            out[k] = v
    return out


class ScramClient:
    """One SCRAM-SHA-256 exchange. Stateful: call :meth:`client_first`,
    then :meth:`client_final` with the server-first message, then
    :meth:`verify_server_final` with the server-final message."""

    def __init__(
        self,
        password: str,
        nonce: str | None = None,
        username: str = "",
        channel_binding: bytes | None = None,
        tls_without_plus: bool = False,
    ):
        # PG ignores the SCRAM username (startup-packet user wins), so
        # the transport leaves it empty like libpq; the parameter exists
        # so the RFC 7677 test vector (n=user) can pin the math.
        try:
            self._password = password.encode("ascii")
        except UnicodeEncodeError:
            # SASLprep (RFC 4013) is not implemented; failing loudly
            # beats authenticating with a differently-normalized string
            raise NotImplementedError(
                "scram: non-ASCII passwords require SASLprep "
                "normalization, which is not implemented"
            ) from None
        # gs2 header (RFC 5802 §7): 'p=<type>' binds the TLS channel
        # (SCRAM-SHA-256-PLUS, channel_binding = cert_cb_data(...));
        # 'y' claims CB support on a TLS link where the server offered
        # only the plain mechanism (downgrade detection); 'n' is the
        # plaintext-connection default.
        self._cb_data = channel_binding or b""
        if channel_binding is not None:
            self._gs2 = GS2_HEADER_PLUS
        elif tls_without_plus:
            self._gs2 = GS2_HEADER_Y
        else:
            self._gs2 = GS2_HEADER
        self._cbind = base64.b64encode(
            self._gs2.encode() + self._cb_data
        ).decode()
        self._nonce = nonce or base64.b64encode(
            secrets.token_bytes(18)
        ).decode()
        self.client_first_bare = f"n={username},r={self._nonce}"
        self._server_signature: str | None = None

    def client_first(self) -> bytes:
        """The SASLInitialResponse payload: gs2 header + bare message.
        PG ignores the SCRAM ``n=`` username (the startup-packet user
        wins), so it is sent empty — same as libpq."""
        return (self._gs2 + self.client_first_bare).encode()

    def client_final(self, server_first: bytes) -> bytes:
        """server-first (``r=…,s=…,i=…``) → SASLResponse payload, and
        precompute the expected server signature for mutual auth."""
        sf = server_first.decode()
        attrs = _attrs(sf)
        nonce = attrs["r"]
        if not nonce.startswith(self._nonce) or nonce == self._nonce:
            raise ConnectionError(
                "scram: server nonce does not extend the client nonce"
            )
        salt = base64.b64decode(attrs["s"])
        iterations = int(attrs["i"])
        salted = hashlib.pbkdf2_hmac(
            "sha256", self._password, salt, iterations
        )
        client_key = hmac.digest(salted, b"Client Key", "sha256")
        stored_key = hashlib.sha256(client_key).digest()
        without_proof = f"c={self._cbind},r={nonce}"
        auth_message = ",".join(
            [self.client_first_bare, sf, without_proof]
        ).encode()
        client_sig = hmac.digest(stored_key, auth_message, "sha256")
        proof = bytes(a ^ b for a, b in zip(client_key, client_sig))
        server_key = hmac.digest(salted, b"Server Key", "sha256")
        self._server_signature = base64.b64encode(
            hmac.digest(server_key, auth_message, "sha256")
        ).decode()
        return (
            without_proof + ",p=" + base64.b64encode(proof).decode()
        ).encode()

    def verify_server_final(self, server_final: bytes) -> None:
        """AuthenticationSASLFinal's ``v=`` must equal the signature
        derived from the shared salted password — rejects a server that
        accepted the proof without knowing the password."""
        attrs = _attrs(server_final.decode())
        v = attrs.get("v")
        if self._server_signature is None or v is None or not hmac.compare_digest(
            v, self._server_signature
        ):
            raise ConnectionError(
                "scram: server signature verification failed"
            )
