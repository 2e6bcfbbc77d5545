"""PHI encryption/decryption as vectorized Pandas UDFs.

Re-expresses the reference's Fernet service (reference:
app/services/encryption.py:28-38 — `encrypt`/`decrypt` with empty-string
passthrough; key management :18-26 reads a urlsafe-base64 key from env and
generates an ephemeral one when absent).

Spark-first design decisions:
- Arrow-batched ``pandas_udf`` (not row-at-a-time UDF): ciphertext work is
  pure Python, so batching is the difference between ~10⁴ and ~10⁶ rows/s/core.
- ``encrypt_udf`` is marked ``asNondeterministic()``: Fernet embeds a random
  IV + timestamp, so the same plaintext yields different ciphertext per call.
  Without the flag Catalyst may collapse common subexpressions or re-execute
  the projection on retry with different results.
- The key crosses to executors inside the UDF closure (a 44-byte token);
  it must never be logged or written to any table.
- Empty-string passthrough is preserved (reference encryption.py:30-31,:36-37).
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cryptography.fernet import Fernet

# The reference reads PHI_ENCRYPTION_KEY (app/services/encryption.py:18-26);
# accept it first so operators configured for the reference keep their data
# recoverable, with ETL_ENCRYPTION_KEY as this engine's alias.
_ENV_KEYS = ("PHI_ENCRYPTION_KEY", "ETL_ENCRYPTION_KEY")
_ephemeral_key: bytes | None = None
_warned_ephemeral = False


def get_key() -> bytes:
    """Key from env (PHI_ENCRYPTION_KEY, then ETL_ENCRYPTION_KEY), else a
    process-lifetime ephemeral key — dev/test only: data encrypted under an
    ephemeral key is UNRECOVERABLE after the process exits, so the fallback
    warns loudly once."""
    global _ephemeral_key, _warned_ephemeral
    for name in _ENV_KEYS:
        env = os.environ.get(name)
        if env:
            return env.encode()
    if _ephemeral_key is None:
        _ephemeral_key = Fernet.generate_key()
    if not _warned_ephemeral:
        import logging

        logging.getLogger(__name__).warning(
            "No %s set — using a process-lifetime EPHEMERAL encryption key; "
            "encrypted data will be unrecoverable after this process exits",
            " or ".join(_ENV_KEYS),
        )
        _warned_ephemeral = True
    return _ephemeral_key


def make_encrypt_udf(key: bytes | None = None):
    """Vectorized encrypt UDF. Non-deterministic (random IV per call)."""
    key = key or get_key()

    @F.pandas_udf(T.StringType())
    def _encrypt(s: pd.Series) -> pd.Series:
        f = Fernet(key)  # construct once per Arrow batch
        return s.map(
            lambda v: v if v is None or v == "" else f.encrypt(v.encode()).decode()
        )

    return _encrypt.asNondeterministic()


def make_decrypt_udf(key: bytes | None = None):
    """Vectorized decrypt UDF (deterministic inverse of encrypt)."""
    key = key or get_key()

    @F.pandas_udf(T.StringType())
    def _decrypt(s: pd.Series) -> pd.Series:
        f = Fernet(key)
        return s.map(
            lambda v: v if v is None or v == "" else f.decrypt(v.encode()).decode()
        )

    return _decrypt


def encrypt_col(col: str | Column, key: bytes | None = None) -> Column:
    return make_encrypt_udf(key)(F.col(col) if isinstance(col, str) else col)


def decrypt_col(col: str | Column, key: bytes | None = None) -> Column:
    return make_decrypt_udf(key)(F.col(col) if isinstance(col, str) else col)
