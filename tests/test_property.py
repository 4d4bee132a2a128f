"""Property-based tests (hypothesis) for the pure-expression operators — the test
family the reference lacks entirely (SURVEY §5 'absent from the reference').

Each property runs one small Spark job per example; max_examples is tuned so the
whole module stays in tens of seconds.
"""

from __future__ import annotations

import math
import re

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from hadoop_migration_assessment_tools_spark.ext.text import token_count
from hadoop_migration_assessment_tools_spark.functions.scalars import (
    is_supported_hive_version,
    mr_job_to_application_id,
)
from hadoop_migration_assessment_tools_spark.operators.events import extract_entity_names

_SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _py_version_supported(v: str) -> bool:
    """Reference semantics (VersionValidator.java:44-55): ^(\\d+)\\.(\\d+).* then
    major==2 ? minor>=2 : major==3 — made TOTAL. The reference's
    Integer.parseInt throws an UNCAUGHT NumberFormatException on components
    that overflow a 32-bit int (i.e. the reference crashes on
    '2.3000000000'); an engine expression must never crash, so the gate
    parses each component with try_cast-to-long and applies the same
    comparison: a long-overflowing component nulls to false, and an
    int-overflowing minor under major 2 is simply a very large minor
    (>= 2 -> supported) — the order-preserving total extension of the
    reference's comparison. This model mirrors that long-width parse."""
    m = re.match(r"^(\d+)\.(\d+).*", v)
    if not m:
        return False
    major, minor = int(m.group(1)), int(m.group(2))
    if major > 2**63 - 1 or minor > 2**63 - 1:
        return False  # try_cast('long') -> null -> coalesce(false)
    return minor >= 2 if major == 2 else major == 3


version_strings = st.one_of(
    st.from_regex(r"[0-9]{1,3}\.[0-9]{1,3}(\.[0-9]{1,3})?", fullmatch=True),
    # wide components: exercises int/long overflow (the r11 ANSI crash) and
    # minors >= 1000 (where a packed major*1000+minor encoding diverges)
    st.from_regex(r"[0-9]{1,24}\.[0-9]{1,24}", fullmatch=True),
    st.text(
        alphabet="0123456789.abcxyz", min_size=0, max_size=12
    ),
)


@settings(**_SETTINGS)
@given(st.lists(version_strings, min_size=1, max_size=8))
def test_version_gate_matches_reference_semantics(spark, versions):
    df = spark.createDataFrame([(v,) for v in versions], ["v"])
    got = [
        r["ok"]
        for r in df.select(is_supported_hive_version(F.col("v")).alias("ok")).collect()
    ]
    assert got == [_py_version_supported(v) for v in versions]


entity_lists = st.lists(
    st.tuples(
        st.sampled_from(["TABLE", "PARTITION", "DATABASE", "DUMMY"]),
        st.text(alphabet="abc@=_0123456789", min_size=1, max_size=10),
    ),
    min_size=0,
    max_size=12,
)


@settings(**_SETTINGS)
@given(entity_lists)
def test_entity_extraction_set_semantics(spark, entities):
    """FLT1-3 invariant: output == sorted distinct names of the requested type,
    regardless of input order or duplication (HashSet semantics + our determinism)."""
    rows = [([{"entity_type": t, "name": n} for t, n in entities],)]
    df = spark.createDataFrame(
        rows, "inputs array<struct<entity_type string, name string>>"
    )
    got = df.select(
        extract_entity_names(F.col("inputs"), "TABLE").alias("out")
    ).collect()[0]["out"]
    expected = sorted({n for t, n in entities if t == "TABLE"})
    assert got == expected


job_ids = st.one_of(
    st.from_regex(r"job_[0-9]{1,13}_[0-9]{1,6}", fullmatch=True),
    st.text(alphabet="job_0123456789abc", min_size=0, max_size=20),
)


@settings(**_SETTINGS)
@given(st.lists(job_ids, min_size=1, max_size=8))
def test_app_id_conversion_total(spark, ids):
    """FLT7 invariant: well-formed 'job_<d>_<d>' maps to 'application_<d>_<d>';
    anything else maps to null — never throws, never mangles."""
    df = spark.createDataFrame([(i,) for i in ids], ["job_id"])
    got = [
        r["app"]
        for r in df.select(mr_job_to_application_id(F.col("job_id")).alias("app")).collect()
    ]
    for src, out in zip(ids, got):
        if re.fullmatch(r"job_\d+_\d+", src):
            assert out == "application_" + src[4:]
        else:
            assert out is None


json_values = st.one_of(
    st.integers(min_value=-(2**70), max_value=2**70),  # spans long overflow both ways
    st.text(alphabet="0123456789-x.", min_size=0, max_size=25),
    st.none(),
)


@settings(**_SETTINGS)
@given(st.lists(json_values, min_size=1, max_size=8))
def test_json_get_long_total_under_ansi(spark, values):
    """json_get_long invariant (r12 ANSI audit): the JSON value is external
    input, so ANY value — including integers that overflow BIGINT, which under
    ANSI mode crashed a plain cast — yields the parsed long when it fits and
    null otherwise. The query must never throw."""
    import json as _json

    from hadoop_migration_assessment_tools_spark.functions.scalars import json_get_long

    payloads = [_json.dumps({"k": v}) for v in values]
    df = spark.createDataFrame([(p,) for p in payloads], ["props"])
    got = [r["k"] for r in df.select(json_get_long("props", "k").alias("k")).collect()]
    for v, out in zip(values, got):
        if isinstance(v, int) and -(2**63) <= v < 2**63:
            assert out == v
        elif isinstance(v, str):
            # extracted as a bare string; parses iff it is a valid long literal
            try:
                iv = int(v)
                expect = iv if -(2**63) <= iv < 2**63 else None
            except ValueError:
                expect = None
            assert out == expect
        else:
            assert out is None


texts = st.text(
    alphabet=st.sampled_from(list("ab c\t\nxyz  ")), min_size=0, max_size=60
)


@settings(**_SETTINGS)
@given(st.lists(texts, min_size=1, max_size=6))
def test_token_count_matches_python_split(spark, docs):
    """token_count == len(str.split()) (Python's split collapses all whitespace —
    the same semantics as our trim + \\s+ split)."""
    df = spark.createDataFrame([(t,) for t in docs], ["text"])
    got = [r["n"] for r in df.select(token_count(F.col("text")).alias("n")).collect()]
    assert got == [len(t.split()) for t in docs]


# --- Avro OCF codec properties (no Spark session needed) ----------------------------

import datetime as _dt
import io as _io

from hadoop_migration_assessment_tools_spark.sources.avro_ocf import (
    _read_long,
    _write_long,
    read_ocf_bytes,
    struct_to_avsc,
)
from hadoop_migration_assessment_tools_spark.schema import QUERY_EVENTS_SCHEMA
from hadoop_migration_assessment_tools_spark.sources.avro_ocf import OcfWriter

_I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@settings(**_SETTINGS)
@given(st.lists(_I64, min_size=1, max_size=50))
def test_zigzag_varint_roundtrip_property(values):
    buf = _io.BytesIO()
    for v in values:
        _write_long(buf, v)
    buf.seek(0)
    assert [_read_long(buf) for _ in values] == values


_utc_naive_ms = st.datetimes(
    min_value=_dt.datetime(1900, 1, 1), max_value=_dt.datetime(2200, 1, 1)
).map(lambda d: d.replace(microsecond=(d.microsecond // 1000) * 1000))

_event_records = st.fixed_dictionaries(
    {},
    optional={
        "QueryId": st.text(max_size=40),
        "QueryText": st.text(max_size=200),  # arbitrary unicode incl. surrogate-free
        "EventType": st.sampled_from(["QUERY_SUBMITTED", "QUERY_COMPLETED"]),
        "StartTime": _utc_naive_ms,
        "EndTime": _utc_naive_ms,
        "TablesRead": st.lists(st.text(max_size=20), max_size=5),
        "DatabasesWritten": st.lists(st.text(max_size=10), max_size=3),
        "ErrorMessage": st.one_of(st.none(), st.text(max_size=100)),
        "CountersObject": st.one_of(st.none(), st.text(max_size=80)),
    },
)


@settings(**_SETTINGS)
@given(st.lists(_event_records, min_size=0, max_size=20),
       st.sampled_from(["null", "deflate"]))
def test_ocf_roundtrip_property(records, codec):
    """Any QueryEvents-shaped record set survives encode→decode bit-exactly:
    absent fields come back null, unicode strings intact, timestamps at millisecond
    resolution, arrays in order; both codecs."""
    avsc = struct_to_avsc(QUERY_EVENTS_SCHEMA)
    buf = _io.BytesIO()
    w = OcfWriter(buf, avsc, codec=codec)
    for r in records:
        w.append(r)
    w.flush()
    _, out = read_ocf_bytes(buf.getvalue())
    assert len(out) == len(records)
    for src, got in zip(records, out):
        for f in QUERY_EVENTS_SCHEMA.fields:
            expect = src.get(f.name)
            assert got[f.name] == expect, (f.name, expect, got[f.name])


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(min_value=0, max_value=900), min_size=1, max_size=40),
    st.integers(min_value=64, max_value=512),
)
def test_pack_sequences_invariants_hold_for_any_sizes(spark, sizes, budget):
    """Property form of the packing invariants: for ANY token-size multiset and
    budget — exactly-once, token conservation, overflow iff size > budget, and no
    non-overflow bin above budget."""
    from hadoop_migration_assessment_tools_spark.ext.packing import pack_sequences

    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(sizes)], "doc_id long, n_tok long"
    )
    packed = pack_sequences(df, "n_tok", budget=budget, num_partitions=4).collect()
    assert sorted(r["doc_id"] for r in packed) == list(range(len(sizes)))
    assert {r["doc_id"]: r["n_tokens"] for r in packed} == dict(enumerate(sizes))
    assert {r["doc_id"] for r in packed if r["overflow"]} == {
        i for i, n in enumerate(sizes) if n > budget
    }
    fills: dict = {}
    for r in packed:
        if not r["overflow"]:
            fills[r["bin_id"]] = fills.get(r["bin_id"], 0) + r["n_tokens"]
    assert all(v <= budget for v in fills.values())


@settings(**_SETTINGS)
@given(st.lists(st.text(alphabet="ab cd", min_size=0, max_size=60), min_size=1, max_size=10))
def test_two_band_outputs_well_formed(spark, texts):
    """Two-band decontamination structural properties on arbitrary text: ratio in
    [0,1], hits <= shingles, and flagged implies (long_hit or ratio >= tau)."""
    from hadoop_migration_assessment_tools_spark.ext.dedup import two_band_decontaminate

    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    ev = spark.createDataFrame([(999, "a b c d a b c d a b c d a b")], "doc_id long, text string")
    out = two_band_decontaminate(train, ev, k_long=13, k_short=8, tau=0.4).collect()
    for r in out:
        assert 0.0 <= r["short_ratio"] <= 1.0
        assert r["n_short_hits"] <= r["n_short_shingles"]
        assert r["flagged"] == (r["long_hit"] or r["short_ratio"] >= 0.4)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255)),
        min_size=1,
        max_size=30,
        unique=True,
    )
)
def test_zorder_key_is_a_bijection(spark, pairs):
    """Morton interleave must be invertible: distinct (x, y) -> distinct z, and
    Python-side bit de-interleave recovers the inputs exactly."""
    from hadoop_migration_assessment_tools_spark.plans.zorder import zorder_key

    df = spark.createDataFrame(pairs, "x: long, y: long")
    rows = df.select("x", "y", zorder_key([F.col("x"), F.col("y")], 8).alias("z")).collect()
    assert len({r["z"] for r in rows}) == len(pairs)
    for r in rows:
        x = sum(((r["z"] >> (2 * i)) & 1) << i for i in range(8))
        y = sum(((r["z"] >> (2 * i + 1)) & 1) << i for i in range(8))
        assert (x, y) == (r["x"], r["y"])


@settings(**_SETTINGS)
@given(
    st.lists(st.text(alphabet="abcxyz", min_size=1, max_size=6), min_size=1, max_size=25),
    st.sampled_from([("a", "b"), ("a", "a"), ("x", "y")]),
)
def test_bpe_merge_fold_matches_python(spark, syms, pair):
    """The Spark left-fold merge must equal the canonical Python merge loop on
    arbitrary symbol sequences (incl. overlap runs)."""
    from hadoop_migration_assessment_tools_spark.ext.bpe import apply_merge_expr

    a, b = pair
    df = spark.createDataFrame([(syms,)], "syms: array<string>")
    got = df.select(apply_merge_expr(F.col("syms"), a, b).alias("m")).collect()[0]["m"]
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    assert got == out


@settings(**_SETTINGS)
@given(
    st.dictionaries(
        st.sampled_from(["d0", "d1", "d2", "d3"]),
        st.integers(1, 400),
        min_size=2,
        max_size=4,
    ),
    st.integers(10, 300),
)
def test_temperature_rates_structural_properties(spark, counts, target):
    """For any domain distribution: rates in (0, 1]; effective weights flatter
    than natural (min/max effective-weight ratio >= natural min/max ratio)."""
    from hadoop_migration_assessment_tools_spark.ext.sampling import domain_rates

    rows = [(f"{d}_{i}", d) for d, n in counts.items() for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id: string, domain: string")
    rates = {r["domain"]: r["rate"] for r in domain_rates(df, "domain", target, id_col="doc_id").collect()}
    assert set(rates) == set(counts)
    for d, r in rates.items():
        assert 0 < r <= 1.0, (d, r)
    eff = {d: rates[d] * counts[d] for d in counts}  # expected picks per domain
    lo_d, hi_d = min(counts, key=counts.get), max(counts, key=counts.get)
    if counts[hi_d] > counts[lo_d] and rates[hi_d] < 1.0 and rates[lo_d] < 1.0:
        assert eff[lo_d] / eff[hi_d] >= counts[lo_d] / counts[hi_d] - 1e-9


@settings(**_SETTINGS)
@given(
    st.lists(st.text(alphabet="ab c", min_size=0, max_size=25), min_size=1, max_size=8),
    st.lists(
        st.one_of(st.none(), st.text(alphabet="ab c", min_size=0, max_size=25)),
        min_size=1,
        max_size=8,
    ),
)
def test_incremental_ingest_matches_python_reference(spark, corpus_texts, batch_texts):
    """Admission fuzz: stages 1+2 (exact gates) must match a pure-Python replay on
    arbitrary text (whitespace-only, empty, all-duplicate batches, NULL text —
    the case the r4 review caught vanishing — included); stage 3 rejections must
    be a subset of batch ids and only ever fire for docs with >= k tokens on
    both sides."""
    from hadoop_migration_assessment_tools_spark.ext.ingest import incremental_ingest

    existing = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus_texts)], "doc_id long, text string"
    )
    incoming = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(batch_texts)], "doc_id long, text string"
    )
    admitted, audit = incremental_ingest(existing, incoming, jaccard_threshold=0.99)
    adm = {r["doc_id"] for r in admitted.collect()}
    aud = {r["doc_id"]: r["reason"] for r in audit.collect()}

    # python replay of stages 1+2
    corpus_set = set(corpus_texts)
    expect = {}
    seen_batch: dict[str, int] = {}
    for i, t in enumerate(batch_texts):
        did = 100 + i
        if t is None:
            expect[did] = "null_text"
        elif t in corpus_set:
            expect[did] = "exact_vs_corpus"
        elif t in seen_batch:
            expect[did] = "exact_in_batch"
        else:
            seen_batch[t] = did
    for did, reason in expect.items():
        assert aud.get(did) == reason, (did, reason, aud.get(did))
    # partition property: everything lands exactly once
    all_ids = {100 + i for i in range(len(batch_texts))}
    assert adm | set(aud) == all_ids and not (adm & set(aud))
    # stage-3 rejections only for shingle-able texts
    for did, reason in aud.items():
        if reason == "near_dup_vs_corpus":
            t = batch_texts[did - 100]
            assert len([w for w in t.split() if w]) >= 4, (did, t)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.lists(st.sampled_from("abcd"), min_size=0, max_size=20).map(" ".join),
        min_size=2,
        max_size=6,
    )
)
def test_span_coverage_matches_python_reference(spark, texts):
    """Verbatim-span fuzz over a tiny alphabet (maximizes cross-doc k-gram
    collisions): per-doc covered-token counts must equal a direct pure-Python
    replay of the definition — duplicated k-grams (>= 2 distinct docs) and the
    union of their [start, start+k-1] windows."""
    from hadoop_migration_assessment_tools_spark.ext.spans import span_coverage

    K = 3
    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_spans"], r["dup_tokens"])
        for r in span_coverage(df, min_tokens=K).collect()
    }

    toks = {i: [w for w in t.split() if w] for i, t in docs}
    gram_docs: dict[tuple, set] = {}
    for i, ts in toks.items():
        for s in range(len(ts) - K + 1):
            gram_docs.setdefault(tuple(ts[s : s + K]), set()).add(i)
    want = {}
    for i, ts in toks.items():
        starts = [
            s
            for s in range(len(ts) - K + 1)
            if len(gram_docs[tuple(ts[s : s + K])]) >= 2
        ]
        spans: list[list[int]] = []  # [first_start, last_start]
        for s in starts:  # sorted; chain when windows overlap OR touch (gap <= K)
            if spans and s - spans[-1][1] <= K:
                spans[-1][1] = s
            else:
                spans.append([s, s])
        covered = sum(last + K - 1 - first + 1 for first, last in spans)
        want[i] = (len(ts), len(spans), covered)
    assert got == want


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(st.text(alphabet="ab c", min_size=0, max_size=20), min_size=0, max_size=3),
    st.lists(
        st.lists(
            st.one_of(st.none(), st.text(alphabet="ab c", min_size=0, max_size=20)),
            min_size=1,
            max_size=4,
        ),
        min_size=1,
        max_size=3,
    ),
)
def test_ingest_stream_null_and_edge_routing_fuzz(spark, tmp_path_factory, corpus_texts, batches):
    """Streaming-ingest fuzz (VERDICT r5 #7): drive ingest_stream with
    hypothesis-generated micro-batches INCLUDING NULLs, empties and cross-batch
    duplicates, and check the end-to-end composition of `_admitted_before` with
    the null/exact routing against the stream's own observed decisions:

    - every NULL-text row lands in the audit as null_text (never admitted, never
      lost) — null routing is reference-independent, so this is exact;
    - a text present in the corpus, or admitted by an EARLIER batch (growing
      reference set), is deterministically rejected exact_vs_corpus;
    - in-batch repeats of a text are rejected (exact_in_batch or, when the first
      occurrence itself was rejected against the reference, exact_vs_corpus);
    - fresh texts are admitted unless a legitimate stage-3 near-dup fires (tiny
      alphabet -> identical shingle SETS across different texts), which requires
      a shingle-able text on the batch side;
    - audit + admitted PARTITION every batch's ids across the whole stream.
    """
    import os

    from hadoop_migration_assessment_tools_spark.streaming.ingest import ingest_stream

    tmp = str(tmp_path_factory.mktemp("ingfuzz"))
    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus_texts)], "doc_id long, text string"
    )
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    all_ids: dict[int, str | None] = {}
    for bi, batch in enumerate(batches):
        rows = [(100 * (bi + 1) + i, t) for i, t in enumerate(batch)]
        all_ids.update(dict(rows))
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.parquet(
            os.path.join(src, f"f{bi}")
        )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "*"))
    )
    adm_p, aud_p, ckpt = (os.path.join(tmp, d) for d in ("admitted", "audit", "ckpt"))
    ingest_stream(
        corpus, stream, adm_p, aud_p, ckpt, jaccard_threshold=0.99
    ).awaitTermination()

    admitted = {
        r["doc_id"]: r["batch_id"] for r in spark.read.parquet(adm_p).collect()
    }
    audit = {
        r["doc_id"]: (r["reason"], r["batch_id"])
        for r in spark.read.parquet(aud_p).collect()
    }
    # partition property over the whole stream
    assert set(admitted) | set(audit) == set(all_ids)
    assert not (set(admitted) & set(audit))

    # reconstruct the OBSERVED batch order (file-source order is not contractual)
    batch_of = dict(admitted)
    batch_of.update({i: b for i, (_, b) in audit.items()})
    observed_order = sorted({b for b in batch_of.values()})
    reference = {t for t in corpus_texts}
    for b in observed_order:
        ids = sorted(i for i, bb in batch_of.items() if bb == b)
        seen_in_batch: set[str] = set()
        newly_admitted: set[str] = set()
        for did in ids:
            t = all_ids[did]
            if t is None:
                assert did in audit and audit[did][0] == "null_text", (did, audit.get(did))
                continue
            if t in reference:
                assert did in audit and audit[did][0] == "exact_vs_corpus", (
                    did, audit.get(did)
                )
            elif t in seen_in_batch:
                assert did in audit and audit[did][0] in (
                    "exact_in_batch", "exact_vs_corpus"
                ), (did, audit.get(did))
            elif did in audit:
                reason = audit[did][0]
                assert reason == "near_dup_vs_corpus", (did, reason)
                assert len([w for w in t.split() if w]) >= 4, (did, t)
            else:
                newly_admitted.add(t)
            seen_in_batch.add(t)
        reference |= newly_admitted


# --- KMV fold partition-invariance ---------------------------------------------------

_kmv_values = st.lists(
    st.text(alphabet="abcdefgh0123456789", min_size=1, max_size=6),
    min_size=1,
    max_size=40,
)
_kmv_parts = st.lists(st.integers(min_value=0, max_value=3), min_size=1, max_size=40)


@settings(**_SETTINGS)
@given(_kmv_values, _kmv_parts)
def test_kmv_fold_partition_invariance(spark, values, parts):
    """The property the streaming maintainer and docs_shingle_kmv both stand
    on: folding per-partition bottom-k sketches (any assignment of rows to
    partitions, duplicates welcome) through the merge operator yields exactly
    the global bottom-k. Hypothesis drives random multisets and random
    partition assignments against real md5 hash order."""
    from hadoop_migration_assessment_tools_spark.ext.sketch import (
        kmv_bottom_k,
        kmv_bottom_k_hashes,
    )

    k = 8
    rows = [(v, parts[i % len(parts)]) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, ["v", "part"])
    whole = [r["h"] for r in kmv_bottom_k(df, "v", k).collect()]
    per_part = [
        kmv_bottom_k(df.filter(F.col("part") == p), "v", k)
        for p in sorted({p for _, p in rows})
    ]
    merged_in = per_part[0]
    for nxt in per_part[1:]:
        merged_in = merged_in.unionAll(nxt)
    merged = [r["h"] for r in kmv_bottom_k_hashes(merged_in, k).collect()]
    assert merged == whole


# --- bucketed interval join == naive range join ---------------------------------------

_ij_points = st.lists(st.integers(0, 50_000), min_size=1, max_size=60)
_ij_intervals = st.lists(
    st.tuples(st.integers(0, 50_000), st.integers(0, 20_000)),
    min_size=1,
    max_size=25,
)


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(points=_ij_points, intervals=_ij_intervals, bucket=st.sampled_from([60, 1800, 7200]))
def test_interval_join_equals_naive_range_join(spark, points, intervals, bucket):
    """plans/interval_join.py's bucket-replication join must produce EXACTLY the
    naive range-join pair set — each (point, interval) pair once, boundary
    timestamps inclusive — for arbitrary point/interval layouts and bucket
    widths (intervals spanning 0, 1 and many buckets; zero-length intervals;
    points exactly on bucket edges)."""
    import datetime as dt

    from hadoop_migration_assessment_tools_spark.plans.interval_join import (
        point_in_interval_join,
    )

    base = dt.datetime(2024, 1, 1)
    pts = spark.createDataFrame(
        [(i, base + dt.timedelta(seconds=s)) for i, s in enumerate(points)],
        "pid long, p_ts timestamp",
    )
    ivs = spark.createDataFrame(
        [
            (j, base + dt.timedelta(seconds=s), base + dt.timedelta(seconds=s + l))
            for j, (s, l) in enumerate(intervals)
        ],
        "iid long, w_start timestamp, w_end timestamp",
    )
    got = {
        (r["pid"], r["iid"])
        for r in point_in_interval_join(
            pts, "p_ts", ivs, "w_start", "w_end", bucket_seconds=bucket
        ).collect()
    }
    want = {
        (i, j)
        for i, s in enumerate(points)
        for j, (st_, l) in enumerate(intervals)
        if st_ <= s <= st_ + l
    }
    assert got == want


# --- fixed-point Lloyd: engine-independence of the oracle arithmetic -------------------

_fp_vecs = st.lists(
    st.lists(st.floats(-2.0, 2.0, allow_nan=False, width=32), min_size=6, max_size=6),
    min_size=8,
    max_size=40,
)


@settings(max_examples=40, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(vecs=_fp_vecs, nlist=st.sampled_from([2, 3, 5]), iters=st.integers(1, 3))
def test_quantized_lloyd_matches_pure_python_int_replay(vecs, nlist, iters):
    """The emb_topk_scaled_ivf oracle rests on this: train_centroids_quantized
    must be reproducible by a PURE-PYTHON big-int replay of the documented
    arithmetic (floor(x*2^20) quantization, int squared-L2, first-min argmin,
    floor-div means, i*(n-1)//(nlist-1) init) — i.e., no numpy float shortcut
    leaks into the result. This is exactly what the DuckDB unrolled-CTE
    replay computes, so equality here == oracle soundness for ANY data."""
    import math

    import numpy as np

    from hadoop_migration_assessment_tools_spark.ext.similarity import (
        QUANT_SCALE,
        train_centroids_quantized,
    )

    got = train_centroids_quantized(vecs, nlist, iters=iters).tolist()

    # pure-python replay with arbitrary-precision ints
    x = [[math.floor(float(np.float32(v)) * QUANT_SCALE) for v in row] for row in vecs]
    n = len(x)
    cents = [list(x[i * (n - 1) // (nlist - 1)]) for i in range(nlist)]
    for _ in range(iters):
        assign = []
        for row in x:
            best, bestd = 0, None
            for cid, c in enumerate(cents):
                d = sum((a - b) * (a - b) for a, b in zip(row, c))
                if bestd is None or d < bestd:
                    best, bestd = cid, d
            assign.append(best)
        for cid in range(nlist):
            members = [x[i] for i, a in enumerate(assign) if a == cid]
            if members:
                cents[cid] = [
                    sum(col) // len(members) for col in zip(*members)
                ]
    assert got == cents


def test_quantized_lloyd_guards_fail_loudly():
    """ADVICE r9: the fixed-point exactness proofs assume |component| <= 2^22
    after scaling and nlist >= 2 with a non-empty sample — out-of-contract
    inputs must raise, not silently break oracle bit-parity."""
    import numpy as np
    import pytest

    from hadoop_migration_assessment_tools_spark.ext.similarity import (
        _check_quantized_envelope,
        train_centroids_quantized,
    )

    with pytest.raises(ValueError, match="nlist"):
        train_centroids_quantized([[0.1, 0.2]], nlist=1)
    with pytest.raises(ValueError, match="empty training sample"):
        train_centroids_quantized([], nlist=4)
    with pytest.raises(ValueError, match="2\\^22"):
        train_centroids_quantized([[100.0, 0.0], [0.0, 1.0]], nlist=2)
    # in-envelope passes: |v| <= 4.0 exactly at the boundary
    cents = train_centroids_quantized([[4.0, -4.0], [0.5, 0.25]], nlist=2)
    assert cents.shape == (2, 2)
    _check_quantized_envelope(np.asarray(cents))


@settings(max_examples=200, deadline=None)
@given(
    seed=st.integers(0, 2**31),
    n=st.integers(1, 2000),
    ncontexts=st.integers(1, 8),
    skew=st.floats(0.01, 0.99),
)
def test_qm_coder_roundtrip_any_decision_sequence(seed, n, ncontexts, skew):
    """The QM arithmetic coder pair (ext/jarith.py, T.81 Annex D) must
    roundtrip ANY binary decision sequence over any context mix exactly —
    including skewed sequences that drive the estimator deep into the Qe
    table and long MPS runs that exercise the carry/0xFF-stuffing paths.
    Also pins the stuffing invariant on the wire: every 0xFF byte in the
    entropy output is followed by 0x00."""
    import random

    from hadoop_migration_assessment_tools_spark.ext.jarith import (
        ArithDecoder,
        ArithEncoder,
        new_stats,
    )

    rng = random.Random(seed)
    decisions = [
        (rng.randrange(ncontexts), 1 if rng.random() < skew else 0)
        for _ in range(n)
    ]
    enc = ArithEncoder()
    stats = new_stats(ncontexts)
    for ctx, bit in decisions:
        enc.encode(stats, ctx, bit)
    payload = enc.flush()
    i = 0
    while i < len(payload):
        if payload[i] == 0xFF:
            assert i + 1 < len(payload) and payload[i + 1] == 0x00, payload.hex()
            i += 2
        else:
            i += 1
    dec = ArithDecoder(payload, 0)
    dstats = new_stats(ncontexts)
    for k, (ctx, bit) in enumerate(decisions):
        got = dec.decode(dstats, ctx)
        assert got == bit, (k, ctx, bit, got)
    assert bytes(dstats) == bytes(stats)  # estimator states track exactly


@settings(max_examples=40, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    seed=st.integers(0, 2**31),
    hw=st.tuples(st.integers(8, 40), st.integers(8, 40)),
    quality=st.integers(30, 95),
    subsampling=st.sampled_from(["4:4:4", "4:2:0"]),
    precision=st.sampled_from([8, 12]),
)
def test_arith_jpeg_parity_fuzz(seed, hw, quality, subsampling, precision):
    """Property form of the arithmetic/Huffman twin parity: for ANY image,
    quality, subsampling and precision, the two encodings of the same
    quantized coefficients decode identically."""
    import numpy as np

    from hadoop_migration_assessment_tools_spark.ext.jpeg import (
        make_arith_jpeg_bytes,
        make_jpeg_bytes,
        parse_jpeg,
    )

    h, w = hw
    rng = np.random.RandomState(seed % 2**31)
    if precision == 8:
        px = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    else:
        px = (rng.rand(h, w, 3) * 4095).astype(np.uint16)
    kw = dict(quality=quality, subsampling=subsampling, precision=precision)
    a = parse_jpeg(make_arith_jpeg_bytes(px, **kw))
    b = parse_jpeg(make_jpeg_bytes(px, **kw))
    assert (a == b).all()


# --- salted per-group top-k == plain window (r11 property) ----------------------------

_sgt_rows = st.lists(
    st.tuples(
        st.integers(0, 3),        # group (few groups -> heavy collisions)
        st.integers(-50, 50),     # sort value (narrow range -> heavy ties)
    ),
    min_size=1,
    max_size=80,
)


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(rows=_sgt_rows, k=st.sampled_from([1, 2, 5]), buckets=st.sampled_from([2, 4, 8]))
def test_salted_group_topk_equals_plain_window_property(spark, rows, k, buckets):
    """plans/ranking.salted_group_topk must equal the plain per-group window
    for ANY data / k / bucket count, given a total order — including heavy
    sort-key ties (broken by the unique row id) and groups smaller than k.
    Randomized companion to the planted-hot-key pytest and the oracled
    registry row; exercises the deterministic-salt parameter too."""
    from pyspark.sql.window import Window as W

    from hadoop_migration_assessment_tools_spark.ext.sketch import portable_hash60
    from hadoop_migration_assessment_tools_spark.plans.ranking import salted_group_topk

    data = [(i, g, v) for i, (g, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "rid long, grp long, v long")
    order = [F.col("v").desc(), F.col("rid").asc()]
    salt = F.pmod(portable_hash60(F.col("rid")), F.lit(buckets))
    got = sorted(
        map(
            tuple,
            salted_group_topk(df, ["grp"], order, k, buckets, salt=salt)
            .select("grp", "rank", "rid", "v")
            .collect(),
        )
    )
    w = W.partitionBy("grp").orderBy(*order)
    want = sorted(
        map(
            tuple,
            df.withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= k)
            .select("grp", "rank", "rid", "v")
            .collect(),
        )
    )
    assert got == want


# --- DLT priority sampling == pure-python replay (r11 property) -----------------------

_ps_rows = st.lists(
    st.tuples(st.integers(0, 10_000), st.integers(1, 1 << 20)),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[0],
)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(rows=_ps_rows, k=st.sampled_from([1, 4, 16]))
def test_priority_sample_matches_replay_property(spark, rows, k):
    """ext/sampling.priority_sample must equal the documented pure-Python
    integer mechanics for ANY ids/weights/k — sample membership, priorities,
    tau and the max(w, tau) estimator weights — including n <= k (tau 0,
    estimates exact)."""
    import hashlib

    from hadoop_migration_assessment_tools_spark.ext.sampling import (
        PRIORITY_U_BITS,
        priority_sample,
    )

    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = {
        r["doc_id"]: (r["weight"], r["priority"], r["tau"], r["w_hat"])
        for r in priority_sample(df, "w", k, salt="p").collect()
    }

    def u_of(i):
        h = hashlib.md5(f"p{i}".encode()).hexdigest()
        return int(h[:8], 16) % (1 << PRIORITY_U_BITS) + 1

    pri = sorted(((w << PRIORITY_U_BITS) // u_of(i), i, w) for i, w in rows)[::-1]
    tau = pri[k][0] if len(pri) > k else 0
    want = {i: (w, q, tau, max(w, tau)) for q, i, w in pri[:k]}
    assert got == want


# --- bigram pairs structural identities (r11 property) --------------------------------


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    toks=st.lists(
        st.text(alphabet="abcxyz", min_size=1, max_size=3), min_size=0, max_size=12
    )
)
def test_bigram_pairs_reversal_identity(spark, toks):
    """ext/lm.bigram_pairs structural identities for any token list: pair
    count is max(len-1, 0); pairs(reverse(l)) == the original pairs reversed
    with components swapped — the exact property the order-sensitivity
    certification rides on."""
    from hadoop_migration_assessment_tools_spark.ext.lm import bigram_pairs

    df = spark.createDataFrame([(toks,)], "toks array<string>")
    fwd = df.select(bigram_pairs(F.col("toks")).alias("p")).collect()[0]["p"]
    rev = df.select(
        bigram_pairs(F.reverse(F.col("toks"))).alias("p")
    ).collect()[0]["p"]
    want_fwd = [(toks[i], toks[i + 1]) for i in range(max(len(toks) - 1, 0))]
    assert [(p["t1"], p["t2"]) for p in fwd] == want_fwd
    assert [(p["t1"], p["t2"]) for p in rev] == [
        (b, a) for a, b in reversed(want_fwd)
    ]


bm25_corpora = st.lists(
    st.text(alphabet=st.sampled_from(list("ab c dd ee")), min_size=0, max_size=40),
    min_size=2,
    max_size=8,
)


@settings(**_SETTINGS)
@given(bm25_corpora)
def test_bm25_matches_python_replay_property(spark, texts):
    """ext/retrieval.bm25_topk == a sequential pure-Python replay of the same
    quantized Okapi formula on ANY corpus (tiny alphabet -> heavy term
    collisions, empty docs, dup texts): exact integer equality on every
    (query, doc) score, matched-term count, and rank. The first doc is the
    query; the replay orders by (-score, doc_id) like the engine."""
    import math

    from hadoop_migration_assessment_tools_spark.ext.retrieval import (
        RETRIEVAL_SCALE,
        bm25_topk,
    )

    rows = list(enumerate(texts))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    queries = spark.createDataFrame([(0, texts[0])], "query_id long, query_text string")
    got = {
        r["doc_id"]: (r["n_terms_matched"], r["score_e6"], r["rank"])
        for r in bm25_topk(docs, queries, k=len(texts), q_terms=12).collect()
    }

    toks = {i: t.split() for i, t in rows}
    n = len(rows)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfreq: dict = {}
    for terms in toks.values():
        for t in set(terms):
            dfreq[t] = dfreq.get(t, 0) + 1
    qterms = sorted(set(toks[0][:12]))
    expect = {}
    for i, terms in toks.items():
        if i == 0:  # self-exclusion
            continue
        s, m = 0, 0
        for t in qterms:
            tf = terms.count(t)
            if tf == 0:
                continue
            m += 1
            idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            tfn = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len(terms) / avgdl))
            s += math.floor(idf * tfn * float(RETRIEVAL_SCALE))
        if m:
            expect[i] = (m, s)
    ranked = sorted(expect.items(), key=lambda kv: (-kv[1][1], kv[0]))
    want = {i: (m, s, rank) for rank, (i, (m, s)) in enumerate(ranked, 1)}
    assert got == want


def test_version_gate_boundary_pins(spark):
    """Deterministic pins for the gate's edges (beyond hypothesis's reach on
    any single run): int-overflow minors under major 2/3 are LARGE minors
    (total extension -> supported); a LONG-overflow in EITHER component
    rejects even when the other alone would decide; exact long max parses."""
    cases = {
        "2.3000000000": True,            # minor > int max, fits long
        "3.9223372036854775807": True,   # minor == long max
        "3.9223372036854775808": False,  # minor == long max + 1 -> null -> reject
        "9223372036854775808.0": False,  # major overflows long
        "2.2": True,
        "2.1": False,
        "3.0": True,
        "4.0": False,
        "garbage": False,
    }
    df = spark.createDataFrame([(v,) for v in cases], ["v"])
    got = {
        r["v"]: r["ok"]
        for r in df.select(
            "v", is_supported_hive_version(F.col("v")).alias("ok")
        ).collect()
    }
    assert got == cases
    assert got == {v: _py_version_supported(v) for v in cases}


# ---------------------------------------------------------------------------
# r13 kernel properties: pure-NUMPY invariants (no Spark job per example —
# the kernels' inner math is what the oracles' bit-parity depends on)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(2, 4),  # n_coarse
    st.integers(2, 4),  # n_fine
    st.lists(
        st.lists(st.integers(-1000, 1000), min_size=4, max_size=4),
        min_size=8,
        max_size=40,
    ),
)
def test_hier_assign_matches_nested_argmin_reference(nc, nf, rows):
    """_hier_assign_int (shared by the hier trainer and BOTH Arrow kernels)
    vs an independently-written per-row nested argmin with the documented tie
    rules (coarse ties -> lowest cid, fine ties WITHIN the chosen cell ->
    lowest j)."""
    import numpy as np

    from hadoop_migration_assessment_tools_spark.ext.quantize import _hier_assign_int

    x = np.asarray(rows, dtype=np.int64)
    # centroids drawn deterministically from the data (duplicates likely at
    # small ranges -> the tie rules are actually exercised)
    coarse = x[: nc].copy()
    fine = np.vstack([x[(i * 7 + 3) % len(x)] for i in range(nc * nf)]).astype(np.int64)
    got = _hier_assign_int(x, coarse, fine)
    for r in range(len(x)):
        dc = [int(((x[r] - coarse[c]) ** 2).sum()) for c in range(nc)]
        c = min(range(nc), key=lambda i: (dc[i], i))
        dfv = [int(((x[r] - fine[c * nf + j]) ** 2).sum()) for j in range(nf)]
        j = min(range(nf), key=lambda i: (dfv[i], i))
        assert got[r] == c * nf + j, (r, got[r], c, j)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.text(alphabet="abcd", min_size=1, max_size=10), min_size=1, max_size=6),
    st.dictionaries(
        st.text(alphabet="abcd", min_size=1, max_size=3),
        st.integers(1, 40),
        min_size=1,
        max_size=12,
    ),
)
def test_viterbi_kernel_matches_recursive_reference(words, costs):
    """The Viterbi Arrow kernel's DP vs the independently-written recursive
    reference under RANDOM piece tables (tie rule: min cost, then smallest
    start-of-last-piece), including words forced onto the single-char UNK
    fallback."""
    from functools import lru_cache

    from hadoop_migration_assessment_tools_spark.ext.unigram import (
        MAX_PIECE_LEN,
        UNK_COST_BITS,
    )

    # pure-python twin of the kernel's inner loop (no Spark session needed —
    # the kernel body is deterministic per word; exercised through Spark in
    # test_viterbi_segment_matches_independent_reference)
    def kernel_segment(w):
        n = len(w)
        dp = [None] * (n + 1)
        dp[0] = (0, 0, "")
        for i in range(1, n + 1):
            best = None
            for j in range(max(0, i - MAX_PIECE_LEN), i):
                piece = w[j:i]
                c = costs.get(piece)
                if c is None:
                    if i - j > 1:
                        continue
                    c = UNK_COST_BITS
                cand = dp[j][0] + c
                if best is None or cand < best[0]:
                    best = (cand, dp[j][1] + 1, (dp[j][2] + "+" + piece).lstrip("+"))
            dp[i] = best
        return dp[n]

    def ref_segment(w):
        @lru_cache(maxsize=None)
        def best(i):
            if i == 0:
                return (0, 0, ())
            cands = []
            for L in range(1, min(MAX_PIECE_LEN, i) + 1):
                piece = w[i - L : i]
                c = costs.get(piece)
                if c is None:
                    if L != 1:
                        continue
                    c = UNK_COST_BITS
                prev = best(i - L)
                cands.append((prev[0] + c, i - L, prev[1] + 1, prev[2] + (piece,)))
            cands.sort(key=lambda t: (t[0], t[1]))
            return (cands[0][0], cands[0][2], cands[0][3])

        c, np_, pieces = best(len(w))
        return (c, np_, "+".join(pieces))

    for w in words:
        assert kernel_segment(w) == ref_segment(w), (w, costs)
