"""Secure logging — $(slog) (modules/secure-logging/slog.c).

Forward-integrity encrypted logging: every entry is AES-256-GCM
encrypted under a per-entry key derived from an evolving main key
(key_{i+1} = PRF(key_i, GAMMA)), and an aggregated AES-CMAC chains every
ciphertext to its predecessors. Compromise at time t cannot forge or
silently drop entries written before t — verification with key_0 walks
the chain.

Faithful port of the reference primitives (slog.c:49-51 pad constants,
PRF slog.c:490 = AES-CMAC in counter mode, deriveSubKeys slog.c:82,
evolveKey slog.c:470, sLogEntry slog.c:306, entry format
"<12-char b64 counter>:<b64(iv||tag||ct)>"), with two batch-engine
divergences, both documented:

- The chain is strictly sequential (the reference is a single-writer
  daemon), so encryption runs as one ``applyInPandas`` group per chain,
  ordered by an explicit column — the same exact-serial mode as the
  token bucket and ``iterate_rows``. Shard chains by host/partition
  (``key`` columns) for parallelism, like per-host key files.
- The reference draws a random GCM nonce per entry (RAND_bytes,
  slog.c:330); a batch engine must be deterministic under replay, so
  the IV is derived as PRF(encKey, IVPATTERN)[:12]. Nonce uniqueness
  per key — the GCM requirement — then rests on key uniqueness:
  every chain starts from its own ``key0_chain = PRF(key0,
  CMAC(key0, chain-id))`` (so no two chains ever share a (key, IV)
  pair even at the same counter) and every entry within a chain
  encrypts under a fresh evolved key. The remaining caveat is
  inherent to determinism: re-running ``slog_encrypt`` with the SAME
  key0 over MODIFIED plaintexts reuses (key, IV) pairs across runs —
  key0 is single-use per encryption run; derive a fresh one (e.g.
  from a run id) for each corpus version.
"""

from __future__ import annotations

import base64
import struct

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

AES_BLOCKSIZE = 16
IV_LENGTH = 12
KEY_LENGTH = 32
COUNTER_LENGTH = 12

# slog.h:41-43 — the three 16-byte pad patterns
KEYPATTERN = bytes([0x36]) * AES_BLOCKSIZE
MACPATTERN = bytes([0x5C]) * AES_BLOCKSIZE
GAMMA = bytes([0x6A]) * AES_BLOCKSIZE
IVPATTERN = bytes([0x49]) * AES_BLOCKSIZE  # engine-specific (see module doc)


def _cmac(key: bytes, data: bytes) -> bytes:
    from cryptography.hazmat.primitives import cmac as _cm  # noqa: PLC0415
    from cryptography.hazmat.primitives.ciphers import algorithms  # noqa: PLC0415

    c = _cm.CMAC(algorithms.AES(key))
    c.update(data)
    return c.finalize()


def _prf(key: bytes, pattern: bytes, outlen: int = KEY_LENGTH) -> bytes:
    """slog.c PRF: AES-CMAC in counter mode — CMAC(key, pattern),
    CMAC(key, pattern with last byte +1), ... concatenated to outlen."""
    buf = bytearray(pattern)
    out = b""
    n_blocks = outlen // AES_BLOCKSIZE + (1 if outlen % AES_BLOCKSIZE else 0)
    for _ in range(n_blocks):
        out += _cmac(key, bytes(buf))
        buf[-1] = (buf[-1] + 1) & 0xFF
    return out[:outlen]


def evolve_key(key: bytes) -> bytes:
    return _prf(key, GAMMA)


def derive_chain_key(key0: bytes, chain_id: bytes) -> bytes:
    """Per-chain initial key: no two chains may ever encrypt under the
    same (key, IV) pair (deterministic IVs make that catastrophic GCM
    nonce reuse), so each chain's key_0 is PRF(key0, CMAC(key0,
    chain-id)) — CMAC compresses the variable-length chain id to the
    16-byte pattern block _prf expects."""
    return _prf(key0, _cmac(key0, b"slog-chain\x00" + chain_id))


def _chain_id_bytes(pdf: pd.DataFrame, chain_key: list[str] | None) -> bytes:
    if not chain_key:
        return b""
    first = pdf.iloc[0]
    return b"\x1f".join(
        b"" if first[c] is None else str(first[c]).encode("utf-8") for c in chain_key
    )


def derive_sub_keys(main_key: bytes) -> tuple[bytes, bytes]:
    return _prf(main_key, KEYPATTERN), _prf(main_key, MACPATTERN)


def _encrypt_entry(counter: int, text: str, main_key: bytes, big_mac: bytes | None):
    """sLogEntry: returns (entry_string, new_big_mac)."""
    from cryptography.hazmat.primitives.ciphers.aead import AESGCM  # noqa: PLC0415

    enc_key, mac_key = derive_sub_keys(main_key)
    iv = _prf(enc_key, IVPATTERN, IV_LENGTH)
    ct_tag = AESGCM(enc_key).encrypt(iv, text.encode("utf-8"), None)
    ct, tag = ct_tag[:-AES_BLOCKSIZE], ct_tag[-AES_BLOCKSIZE:]
    # entry layout mirrors slog.c:325-327: iv || tag || ciphertext
    ct_buf = iv + tag + ct
    ctr_b64 = base64.b64encode(struct.pack("<Q", counter)).decode()
    entry = f"{ctr_b64:>{COUNTER_LENGTH}.{COUNTER_LENGTH}}:" + base64.b64encode(ct_buf).decode()
    if big_mac is None:
        new_mac = _cmac(mac_key, ct_buf)
    else:
        new_mac = _cmac(mac_key, big_mac + ct_buf)
    return entry, new_mac


def _decrypt_entry(entry: str, main_key: bytes, big_mac: bytes | None):
    """Inverse of _encrypt_entry; returns (counter, text, new_big_mac)
    or raises on tamper (GCM tag mismatch)."""
    from cryptography.hazmat.primitives.ciphers.aead import AESGCM  # noqa: PLC0415

    ctr_b64, _, payload = entry.partition(":")
    counter = struct.unpack("<Q", base64.b64decode(ctr_b64.strip()))[0]
    ct_buf = base64.b64decode(payload)
    iv, tag, ct = (
        ct_buf[:IV_LENGTH],
        ct_buf[IV_LENGTH : IV_LENGTH + AES_BLOCKSIZE],
        ct_buf[IV_LENGTH + AES_BLOCKSIZE :],
    )
    enc_key, mac_key = derive_sub_keys(main_key)
    text = AESGCM(enc_key).decrypt(iv, ct + tag, None).decode("utf-8")
    new_mac = _cmac(mac_key, ct_buf) if big_mac is None else _cmac(mac_key, big_mac + ct_buf)
    return counter, text, new_mac


def slog_encrypt(
    df: DataFrame,
    key0: bytes,
    chain_key: list[str] | None = None,
    order_by: str = "turn_idx",
    text_col: str = "text",
) -> DataFrame:
    """Encrypt ``text_col`` into slog entries, one forward-secure chain
    per ``chain_key`` group (None = one global chain — fully serial,
    like the reference daemon; shard by host for cluster parallelism).

    Adds: ``slog`` (the "CTR:b64" entry), ``slog_counter``, and
    ``slog_mac`` (hex aggregated CMAC *after* this entry — the last
    row's value is the chain's BigMAC to store alongside key state)."""
    out_cols = [f for f in df.columns] + ["slog", "slog_counter", "slog_mac"]
    schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
        + ["slog string", "slog_counter long", "slog_mac string"]
    )
    if chain_key:
        grouped = df.groupBy(*chain_key)
    else:
        # an int literal in groupBy parses as a column ordinal — use a
        # materialized constant column for the single global chain
        df = df.withColumn("_slog_chain", F.lit(0))
        grouped = df.groupBy("_slog_chain")

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_by).reset_index(drop=True)
        key = derive_chain_key(key0, _chain_id_bytes(pdf, chain_key))
        mac = None
        entries, ctrs, macs = [], [], []
        for i, text in enumerate(pdf[text_col]):
            entry, mac = _encrypt_entry(i, "" if text is None else str(text), key, mac)
            entries.append(entry)
            ctrs.append(i)
            macs.append(mac.hex())
            key = evolve_key(key)
        pdf["slog"] = entries
        pdf["slog_counter"] = ctrs
        pdf["slog_mac"] = macs
        return pdf[out_cols]

    return grouped.applyInPandas(fn, schema)


def slog_verify(
    df: DataFrame,
    key0: bytes,
    chain_key: list[str] | None = None,
    slog_col: str = "slog",
) -> DataFrame:
    """slogverify: walk each chain from key_0 in counter order,
    decrypting every entry and re-deriving the aggregated MAC. Adds
    ``slog_text`` (decrypted plaintext; NULL past the first tampered
    entry) and ``slog_ok`` (GCM tag valid AND the running MAC matches
    the stored one — a dropped/reordered/edited entry flips every
    subsequent row to false)."""
    out_cols = [f for f in df.columns] + ["slog_text", "slog_ok"]
    schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
        + ["slog_text string", "slog_ok boolean"]
    )
    if chain_key:
        grouped = df.groupBy(*chain_key)
    else:
        df = df.withColumn("_slog_chain", F.lit(0))
        grouped = df.groupBy("_slog_chain")

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("slog_counter").reset_index(drop=True)
        key = derive_chain_key(key0, _chain_id_bytes(pdf, chain_key))
        mac = None
        texts, oks = [], []
        broken = False
        for i, (entry, stored_mac) in enumerate(zip(pdf[slog_col], pdf["slog_mac"])):
            if broken:
                texts.append(None), oks.append(False)
                continue
            try:
                counter, text, mac = _decrypt_entry(entry, key, mac)
                ok = counter == i and mac.hex() == stored_mac
            except Exception:  # tag mismatch / malformed entry  # noqa: BLE001
                ok, text = False, None
            if not ok:
                broken = True
                texts.append(None), oks.append(False)
            else:
                texts.append(text), oks.append(True)
            key = evolve_key(key)
        pdf["slog_text"] = texts
        pdf["slog_ok"] = oks
        return pdf[out_cols]

    return grouped.applyInPandas(fn, schema)
