"""Property-based checks (hypothesis) on the two components where a
hand-picked example can miss the failure: exact cross-engine money
aggregation (exact.py) and connected-components resolution.

Examples are capped low — each example runs real Spark jobs — but the
generators aim straight at the hazards: values landing on .005 rounding
boundaries, single-partition vs multi-partition summation order, random
graph topologies (chains, cliques, forests) for CC.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_project_gcp_spark import exact as X
from etl_project_gcp_spark.operators import dedup as DD

# money values with exactly 2 decimals, including .005-boundary bait
money = st.integers(min_value=0, max_value=10_000_00).map(
    lambda c: Decimal(c) / 100
)


def _reference_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Plain-Python BFS transitive closure → min reachable id."""
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    out: dict[int, int] = {}
    seen: set[int] = set()
    for start in adj:
        if start in seen:
            continue
        comp, stack = [], [start]
        seen.add(start)
        while stack:
            n = stack.pop()
            comp.append(n)
            for m in adj[n] - seen:
                seen.add(m)
                stack.append(m)
        label = min(comp)
        for n in comp:
            out[n] = label
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vals=st.lists(money, min_size=1, max_size=40), parts=st.integers(1, 5))
def test_dsum_round_and_davg_match_decimal_reference(spark, vals, parts):
    """dsum_round/davg must equal single-threaded Decimal arithmetic
    (half-up) REGARDLESS of how many partitions the sum runs over —
    the order-independence claim exact.py makes."""
    df = spark.createDataFrame(
        [(float(v),) for v in vals], "v double"
    ).repartition(parts)
    got = df.agg(
        X.dsum_round(F.col("v")).alias("s"), X.davg(F.col("v")).alias("a")
    ).collect()[0]
    want_sum = sum(vals).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
    want_avg = (sum(vals) / len(vals)).quantize(
        Decimal("0.01"), rounding=ROUND_HALF_UP
    )
    assert Decimal(str(got.s)) == want_sum, (vals, got.s, want_sum)
    assert Decimal(str(got.a)) == want_avg, (vals, got.a, want_avg)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=1,
        max_size=40,
    )
)
def test_union_find_cc_matches_bfs_reference(spark, edges):
    """Driver union-find on arbitrary graph shapes must equal the BFS
    transitive-closure reference (same min-reachable-id contract)."""
    pairs = spark.createDataFrame(edges, ["a", "b"])
    got = {
        (r.node, r.cluster_id) for r in DD.connected_components(pairs).collect()
    }
    want = set(_reference_components(edges).items())
    assert got == want, (edges,)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80
        ),
        min_size=1,
        max_size=10,
    )
)
def test_normalize_text_is_idempotent(spark, texts):
    """normalize(normalize(x)) == normalize(x) for arbitrary unicode —
    the fixed-point property every canonicalization step needs (dedup
    keys must not change if the pipeline runs twice)."""
    from etl_project_gcp_spark.operators import text as TX

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "t"])
    once = df.select("i", TX.normalize_text("t").alias("n"))
    twice = once.select("i", TX.normalize_text("n").alias("n"))
    a = {r.i: r.n for r in once.collect()}
    b = {r.i: r.n for r in twice.collect()}
    assert a == b


# words drawn from a tiny alphabet so rank collisions/ties and OOV both
# actually occur at max_examples=10
_word = st.text(alphabet="abc", min_size=1, max_size=3)
_doc = st.lists(_word, min_size=1, max_size=12).map(" ".join)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(_doc, min_size=1, max_size=6), vocab=st.integers(1, 5))
def test_unigram_lm_scores_reference(spark, docs, vocab):
    """mean_rank/n_oov must equal a plain-Python replay of the
    vocab-cut + rank + OOV-bucket rules on arbitrary tiny corpora."""
    from collections import Counter

    from etl_project_gcp_spark.operators import text as TX

    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    got = {r.doc_id: r for r in TX.unigram_lm_scores(df, vocab_limit=vocab).collect()}

    freq = Counter(w for d in docs for w in d.lower().split())
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab]
    rank = {w: i + 1 for i, (w, _) in enumerate(ranked)}
    for i, d in enumerate(docs):
        words = d.lower().split()
        ranks = [rank.get(w, vocab + 1) for w in words]
        oov = sum(1 for w in words if w not in rank)
        assert got[i].n_tok == len(words)
        assert got[i].n_oov == oov
        assert got[i].mean_rank == sum(ranks) / len(ranks)
        assert 1.0 <= got[i].mean_rank <= vocab + 1


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    counts=st.lists(st.integers(1, 50), min_size=1, max_size=4),
)
def test_source_mixture_weights_bounds_and_order(spark, counts):
    """rel_weight is in (0, 1], exactly 1.0 for the largest source, and
    ordered like n_tokens (sqrt is monotone)."""
    from etl_project_gcp_spark.operators import text as TX

    rows = [
        (i, " ".join(["w"] * c), f"src{i}") for i, c in enumerate(counts)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = sorted(
        TX.source_mixture_weights(df).collect(), key=lambda r: r.n_tokens
    )
    assert all(0.0 < r.rel_weight <= 1.0 for r in out)
    assert out[-1].rel_weight == 1.0
    for a, b in zip(out, out[1:]):
        assert a.rel_weight <= b.rel_weight


# ---------------------------------------------------------------------------
# Incremental maintenance: SCD2 vs a plain-Python replay
# ---------------------------------------------------------------------------

def _scd2_reference(
    snapshot: dict[int, str], batches: list[dict[int, str]]
) -> set[tuple[int, str, int, bool]]:
    """Sequential in-memory SCD2: history rows as (key, val, version,
    is_current)."""
    hist: list[list] = [[k, v, 1, True] for k, v in snapshot.items()]
    for batch in batches:
        current = {r[0]: r for r in hist if r[3]}
        for k, v in batch.items():
            cur = current.get(k)
            if cur is None:
                hist.append([k, v, 1, True])
            elif cur[1] != v:
                cur[3] = False
                hist.append([k, v, cur[2] + 1, True])
    return {tuple(r) for r in hist}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    snapshot=st.dictionaries(
        st.integers(0, 12), st.sampled_from("abc"), max_size=10
    ),
    batches=st.lists(
        st.dictionaries(st.integers(0, 12), st.sampled_from("abc"), max_size=8),
        min_size=1,
        max_size=3,
    ),
)
def test_scd2_apply_matches_python_replay(spark, snapshot, batches):
    """Any sequence of update batches: the distributed SCD2 history
    equals the sequential in-memory reference — one current row per
    surviving key, versions from the matched row, unchanged values
    no-ops."""
    from etl_project_gcp_spark.plans import incremental as INC

    schema = "id int, val string"
    hist = INC.scd2_init(
        spark.createDataFrame(list(snapshot.items()) or [], schema), "id"
    )
    for batch in batches:
        upd = spark.createDataFrame(list(batch.items()) or [], schema)
        hist = INC.scd2_apply(hist, upd, "id", ["val"])
    got = {
        (r.id, r.val, r.version, r.is_current) for r in hist.collect()
    }
    assert got == _scd2_reference(snapshot, batches)


# ---------------------------------------------------------------------------
# Incremental MERGE / SCD2 semantics (plans/incremental.py) — random
# (target, batch) pairs vs a plain-Python reference of the SQL MERGE
# contract. Hazards aimed at: keys present in both/either side only,
# NULL attribute values, batches that change nothing.
# ---------------------------------------------------------------------------

kv_table = st.dictionaries(
    st.integers(min_value=0, max_value=30),
    st.one_of(st.none(), st.text(alphabet="abc", max_size=2)),
    max_size=12,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(target=kv_table, batch=kv_table)
def test_merge_upsert_matches_dict_semantics(spark, target, batch):
    """merge_upsert == {**target, **batch}: updates win on collision,
    new keys insert, untouched rows pass through — for ANY pair of
    key→value maps including NULL values and empty sides."""
    from etl_project_gcp_spark.plans.incremental import merge_upsert

    schema = "k int, v string"
    t = spark.createDataFrame(list(target.items()) or [], schema)
    b = spark.createDataFrame(list(batch.items()) or [], schema)
    got = {r.k: r.v for r in merge_upsert(t, b, ["k"]).collect()}
    assert got == {**target, **batch}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(initial=kv_table, batch=kv_table)
def test_scd2_apply_matches_reference_history(spark, initial, batch):
    """scd2_apply vs a plain-Python SCD2: after one batch over a
    version-1 history, every key's version chain, is_current flag, and
    value must match the reference (NULL-safe change comparison)."""
    from etl_project_gcp_spark.plans.incremental import (
        scd2_apply,
        scd2_init,
    )

    schema = "k int, v string"
    hist = scd2_init(
        spark.createDataFrame(list(initial.items()) or [], schema), "k"
    )
    b = spark.createDataFrame(list(batch.items()) or [], schema)
    got = {
        (r.k, r.version): (r.v, r.is_current)
        for r in scd2_apply(hist, b, "k", ["v"]).collect()
    }

    want = {}
    for k, v in initial.items():
        if k in batch and batch[k] != v:      # changed: close + append
            want[(k, 1)] = (v, False)
            want[(k, 2)] = (batch[k], True)
        else:                                 # untouched or no-op update
            want[(k, 1)] = (v, True)
    for k, v in batch.items():
        if k not in initial:                  # brand-new key
            want[(k, 1)] = (v, True)
    assert got == want


_itext = st.text(alphabet="xy ", min_size=0, max_size=6)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    delta=st.lists(_itext, min_size=1, max_size=8),
    corpus=st.lists(_itext, min_size=0, max_size=8),
)
def test_incremental_dedup_matches_set_reference(spark, delta, corpus):
    """incremental_dedup must equal the plain-Python set semantics:
    group delta by content, drop contents present in the corpus, keep
    (min id, copy count) — on arbitrary tiny corpora where in-batch
    duplicates and delta∩corpus overlaps both actually occur (tiny
    'xy ' alphabet forces collisions)."""
    schema = "doc_id long, text string"
    d_df = spark.createDataFrame(list(enumerate(delta)), schema)
    c_df = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(corpus)], schema
    )
    got = {
        r.doc_id: r.n_new_copies
        for r in DD.incremental_dedup(d_df, c_df).collect()
    }
    seen = set(corpus)
    want: dict[str, list[int]] = {}
    for i, t in enumerate(delta):
        if t not in seen:
            want.setdefault(t, []).append(i)
    assert got == {min(ids): len(ids) for ids in want.values()}, (
        delta, corpus,
    )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ids=st.lists(
        st.integers(min_value=-(2**62), max_value=2**62),
        min_size=1,
        max_size=40,
        unique=True,
    ),
    modulus=st.sampled_from([2, 10, 100, 10007]),
)
def test_stable_bucket_matches_md5_reference(spark, ids, modulus):
    """The engine-independence claim behind doc_stable_sample /
    train_val_test_split / shard_manifest, pinned against a
    plain-Python reference: stable_bucket(id, m) must equal
    int(md5(str(id))[:8], 16) % m for ANY long id (negatives included —
    Spark's CAST(long AS string) and Python's str() must agree) and any
    modulus."""
    import hashlib

    from etl_project_gcp_spark.operators.text import stable_bucket

    got = {
        r.i: r.b
        for r in spark.createDataFrame([(i,) for i in ids], "i long")
        .select("i", stable_bucket("i", modulus).alias("b"))
        .collect()
    }
    want = {
        i: int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % modulus
        for i in ids
    }
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=40,
    )
)
def test_connected_components_distributed_matches_union_find(spark, edges):
    """The forced-distributed CC path (min-label propagation + the r10
    adaptive pointer shortcut) must assign every node the minimum id
    of its component on ARBITRARY graphs — random edge lists (self
    loops and duplicates included) compared against an independent
    pure-Python union-find. Guards the shortcut's invariant (label(u)
    is always in u's component) against regressions no fixed-shape
    test would catch."""
    from etl_project_gcp_spark.operators import dedup as DD

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_min: dict[int, int] = {}
    for n in parent:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    want = {(n, comp_min[find(n)]) for n in parent}

    pairs = spark.createDataFrame(edges, "a int, b int")
    got = {
        (r.node, r.cluster_id)
        for r in DD.connected_components(
            pairs, small_graph_threshold=0
        ).collect()
    }
    assert got == want
