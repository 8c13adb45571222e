"""Secure logging ($(slog), modules/secure-logging) tests: roundtrip,
forward-integrity tamper evidence, per-host chain sharding."""

import pytest

pytest.importorskip("cryptography")

from pyspark.sql import functions as F  # noqa: E402

from syslog_ng_spark.operators import slog as S  # noqa: E402

KEY0 = bytes(range(32))


@pytest.fixture()
def logs(spark):
    rows = [("h1", i, f"event number {i} on h1") for i in range(6)] + [
        ("h2", i, f"h2 says {i}") for i in range(4)
    ]
    return spark.createDataFrame(rows, "host string, turn_idx int, text string")


def test_slog_roundtrip(spark, logs):
    enc = S.slog_encrypt(logs, KEY0, chain_key=["host"])
    rows = enc.orderBy("host", "slog_counter").collect()
    # entry format: 12-char base64 counter, colon, base64 payload
    assert all(r["slog"][12] == ":" for r in rows)
    # ciphertext never contains the plaintext
    assert all(r["text"] not in r["slog"] for r in rows)
    ver = S.slog_verify(enc, KEY0, chain_key=["host"])
    got = ver.orderBy("host", "slog_counter").collect()
    assert all(r["slog_ok"] for r in got)
    assert [r["slog_text"] for r in got] == [r["text"] for r in got]


def test_slog_key_evolution_gives_distinct_ciphertexts(spark):
    # identical plaintexts at different positions encrypt differently
    # (fresh evolved key per entry — the forward-secrecy property)
    df = spark.createDataFrame(
        [(0, "same"), (1, "same"), (2, "same")], "turn_idx int, text string"
    )
    enc = S.slog_encrypt(df, KEY0).collect()
    payloads = {r["slog"].split(":", 1)[1] for r in enc}
    assert len(payloads) == 3


def test_slog_tamper_detection(spark, logs):
    enc = S.slog_encrypt(logs, KEY0, chain_key=["host"])
    # flip one character inside h1's entry #2 ciphertext
    tampered = enc.withColumn(
        "slog",
        F.when(
            (F.col("host") == "h1") & (F.col("slog_counter") == 2),
            F.concat(F.substring("slog", 1, 20), F.lit("AAAA"), F.expr("substring(slog, 25)")),
        ).otherwise(F.col("slog")),
    )
    ver = S.slog_verify(tampered, KEY0, chain_key=["host"]).collect()
    by = {(r["host"], r["slog_counter"]): r for r in ver}
    assert by[("h1", 0)]["slog_ok"] and by[("h1", 1)]["slog_ok"]
    # the tampered entry and EVERYTHING after it on that chain is dead
    assert not by[("h1", 2)]["slog_ok"]
    assert not by[("h1", 5)]["slog_ok"]
    # the other host's chain is untouched
    assert all(by[("h2", i)]["slog_ok"] for i in range(4))


def test_slog_drop_detection(spark, logs):
    # deleting an entry breaks the aggregated MAC chain from that point
    enc = S.slog_encrypt(logs, KEY0, chain_key=["host"])
    dropped = enc.filter(~((F.col("host") == "h1") & (F.col("slog_counter") == 1)))
    ver = S.slog_verify(dropped, KEY0, chain_key=["host"]).collect()
    by = {(r["host"], r["slog_counter"]): r for r in ver}
    assert by[("h1", 0)]["slog_ok"]
    assert not by[("h1", 2)]["slog_ok"]  # gap detected (counter mismatch)


def test_slog_prf_primitives():
    # PRF determinism + evolution is not an involution
    k1 = S.evolve_key(KEY0)
    k2 = S.evolve_key(k1)
    assert k1 != KEY0 and k2 != k1 and len(k1) == 32
    enc, mac = S.derive_sub_keys(KEY0)
    assert enc != mac and len(enc) == len(mac) == 32
    assert S._prf(KEY0, S.GAMMA) == S._prf(KEY0, S.GAMMA)


def test_slog_chains_never_share_key_iv(spark):
    """Two chains encrypting the SAME plaintext at the SAME counter must
    produce different payloads — each chain starts from its own
    derive_chain_key(key0, chain-id), so no (key, IV) pair is ever
    shared across chains (deterministic IVs make sharing catastrophic
    GCM nonce reuse; reference avoids it with RAND_bytes, slog.c:330)."""
    df = spark.createDataFrame(
        [("h1", 0, "identical text"), ("h2", 0, "identical text")],
        "host string, turn_idx int, text string",
    )
    enc = S.slog_encrypt(df, KEY0, chain_key=["host"]).collect()
    payloads = {r["slog"].split(":", 1)[1] for r in enc}
    assert len(payloads) == 2
    # and each chain still verifies from key0
    ver = S.slog_verify(
        S.slog_encrypt(df, KEY0, chain_key=["host"]), KEY0, chain_key=["host"]
    ).collect()
    assert all(r["slog_ok"] for r in ver)
    assert {r["slog_text"] for r in ver} == {"identical text"}


def test_slog_chain_key_derivation_distinct():
    a = S.derive_chain_key(KEY0, b"h1")
    b = S.derive_chain_key(KEY0, b"h2")
    g = S.derive_chain_key(KEY0, b"")
    assert len({a, b, g, KEY0}) == 4
