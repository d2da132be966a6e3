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
this is the auth method a stock modern server demands. Channel-binding
(``SCRAM-SHA-256-PLUS``) is NOT implemented — the transport refuses it
loudly rather than downgrading silently when it is the only offer.

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
        self, password: str, nonce: str | None = None, username: str = ""
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
        self._nonce = nonce or base64.b64encode(
            secrets.token_bytes(18)
        ).decode()
        self.client_first_bare = f"n={username},r={self._nonce}"
        self._server_signature: str | None = None

    def client_first(self) -> bytes:
        """The SASLInitialResponse payload: gs2 header + bare message.
        PG ignores the SCRAM ``n=`` username (the startup-packet user
        wins), so it is sent empty — same as libpq."""
        return (GS2_HEADER + self.client_first_bare).encode()

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
        without_proof = f"c={_CBIND},r={nonce}"
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
