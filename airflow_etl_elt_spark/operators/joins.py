"""Joins: equi, broadcast, semi/anti, fact-fact, TPC-H Q3-style top-k.

The reference is single-table (SURVEY.md §2.3 note) — joins enter via the
north star (driver fixtures + 100 TB pipelines). Strategy notes per function;
the global rules:

- **Broadcast the small side explicitly** when it is known-small by schema
  (region: 5 rows, nation: 25 — dimension tables stay KB-sized at any fact
  scale). Explicit ``F.broadcast`` documents intent; AQE would usually get
  there too but only after computing sizes.
- **Fact-fact joins** (lineitem ⋈ orders) shuffle both sides on the key —
  unavoidable without co-bucketing. At 100 TB, bucket both tables on the join
  key at rest (``bucketBy``) so the exchange disappears; the functions here
  take pre-loaded DataFrames so bucketed or plain inputs both work.
- **Semi/anti** instead of join+distinct / join+filter-null: they stop probing
  at first match and never duplicate rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def nations_with_regions(nation: DataFrame, region: DataFrame) -> DataFrame:
    """Broadcast equi-join of the two smallest dims; zero shuffle."""
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("n_nationkey", "n_name", "r_name")
        .orderBy("n_nationkey")
    )


def revenue_by_segment(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """orders ⋈ customer → revenue + order count per market segment.

    customer is the smaller side at every scale factor (1 customer : ~10
    orders in TPC-H shape). Cost-gated explicit broadcast (same 64 MB bound
    as tpch_q5's customer move): below it the broadcast kills the custkey
    shuffle of BOTH sides; above it — customer is a fact at 100 TB — the
    planner's shuffle join stands. Aggregation is partial before the final
    exchange on c_mktsegment; the output is bounded by |segments| (5), so
    the final order uses ``ordered_small`` (no range exchange).
    """
    from airflow_etl_elt_spark.operators.aggregates import (
        _plan_size_bytes,
        two_tier_dec_agg,
    )
    from airflow_etl_elt_spark.operators.relational import (
        fuse_small_input,
        ordered_small,
    )

    if _plan_size_bytes(customer) < 64 * 1024 * 1024:
        cc = F.broadcast(customer)
        # broadcast probe + fused-small stream side = one fresh-build stage
        orders = fuse_small_input(orders.select("o_custkey", "o_totalprice"))
    else:
        cc = customer
    # order-independent exact grid sum, long partials / decimal merge
    # (bit-identical to dec_sum; aggregates.two_tier_dec_agg — 5 segments
    # is exactly the low-cardinality shape the two-tier form exists for)
    return ordered_small(
        two_tier_dec_agg(
            orders.join(cc, orders.o_custkey == customer.c_custkey),
            ["c_mktsegment"],
            sums={"total_price": "o_totalprice"},
            count_star="order_cnt",
        ),
        "c_mktsegment",
    )


def revenue_by_priority(
    lineitem: DataFrame, orders: DataFrame, colocated: bool = False
) -> DataFrame:
    """Fact-fact join on orderkey, rolled up to order priority.

    ``colocated=True`` (caller knows BOTH sides are bucketed+sorted on the
    orderkey with matching bucket counts — the at-rest layout
    sources/layout.py serves): force the sort-merge join, which then plans
    ZERO exchange and zero sort — the 100 TB shape, with no per-run build
    cost of any kind. The hint matters: left alone, the planner would
    broadcast or shuffle-hash the small-estimate orders side, re-paying a
    hash-relation build every fresh run and bypassing the bucket layout.

    Otherwise, cost-based build-side strategy (same Catalyst statistic the
    optimizer uses for broadcasts): when the pruned orders side is provably
    small, hint SHUFFLE_HASH — the hash build beats both sort-merge (no
    sort) and broadcast (no driver serialization of 100k+ rows; measured
    0.49 s vs 0.71 s default at sf0.1). Above the threshold leave the
    planner alone: per-partition hash builds of an unbounded fact side can
    exhaust reducer memory, so sort-merge is the safe default at scale;
    AQE handles skewed orderkeys by splitting oversized partitions.
    """
    from airflow_etl_elt_spark.operators.aggregates import (
        _MEDIAN_SMALL_BYTES,
        _plan_size_bytes,
        two_tier_dec_agg,
    )
    from airflow_etl_elt_spark.operators.relational import fuse_small_input

    # two_tier_dec_agg: exact grid sum, long partials / decimal merge —
    # bit-identical to dec_sum, and 5 priorities is the low-cardinality
    # shape the two-tier form exists for (see aggregates.py)
    rev = "(l_extendedprice * (1 - l_discount))"  # SQL text: fast build path
    if colocated:
        li = lineitem.select("l_orderkey", "l_extendedprice", "l_discount")
        return two_tier_dec_agg(
            li.join(orders.hint("merge"), li.l_orderkey == orders.o_orderkey),
            ["o_orderpriority"],
            sums={"revenue": rev},
            count_star="line_cnt",
        ).orderBy("o_orderpriority")

    build = orders
    if _plan_size_bytes(orders) < _MEDIAN_SMALL_BYTES:
        build = orders.hint("shuffle_hash")
    # Fresh-build mode: fusing BOTH small sides makes them SinglePartition-
    # compatible, so the join and the rollup plan no exchange at all (one
    # stage). Fusing only one side would just move the exchange; the size
    # gate keys off lineitem (always the larger side here).
    li_pruned = lineitem.select("l_orderkey", "l_extendedprice", "l_discount")
    li_fused = fuse_small_input(li_pruned)
    if li_fused is not li_pruned:
        lineitem = li_fused
        # keep the hash build: SMJ would in-partition-sort both fused sides
        build = fuse_small_input(
            orders.select("o_orderkey", "o_orderpriority")
        ).hint("shuffle_hash")
    return two_tier_dec_agg(
        lineitem.join(build, lineitem.l_orderkey == orders.o_orderkey),
        ["o_orderpriority"],
        sums={"revenue": rev},
        count_star="line_cnt",
    ).orderBy("o_orderpriority")


def customers_with_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """LEFT SEMI: customers having ≥1 order; no row duplication, early-out probe."""
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """LEFT ANTI: the idempotent-append primitive (SURVEY.md §2 row 5) in
    query form — rows whose key is absent from the other side. NULL-safe by
    construction (unlike NOT IN)."""
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Skew-resistant equi-join: spread a hot fact key across ``salt``
    reducers by salting the fact side randomly and replicating the dim side
    ``salt``x.

    When one fact key holds a large fraction of all rows (power-law user_ids,
    null-ish default keys), a plain shuffle join sends that key's entire
    volume to ONE reducer — the straggler that dominates the stage at 100 TB.
    Salting trades ``salt``x duplication of the (small) dim side for an even
    spread of the hot key. AQE's skew-join handles the sort-merge case
    automatically; salting is the explicit form for the cases AQE can't see:
    pre-AQE plans, bucketed inputs that skip the exchange, streaming joins.
    Result is identical to the unsalted join (verified in tests).
    """
    salt_col = (F.rand(seed) * salt).cast("int")
    salted_fact = fact.withColumn("__salt", salt_col)
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    joined = salted_fact.join(
        salted_dim,
        (salted_fact[fact_key] == salted_dim[dim_key])
        & (salted_fact["__salt"] == salted_dim["__salt"]),
        how,
    )
    return joined.drop("__salt")


def top_revenue_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    k: int = 10,
    colocated: bool = False,
) -> DataFrame:
    """TPC-H Q3-shaped: revenue per order for one segment, top-k.

    Join order is selectivity-first: the segment filter prunes customer, that
    prunes orders (segment ≈ 1/|segments| of orders survive), and lineitem —
    the biggest fact — is the STREAM side of the final join. Left to itself,
    Catalyst picked the column-pruned LINEITEM as the build side whenever it
    squeaked under the broadcast threshold (without CBO a join's size
    estimate is the product of its children, so the orders⋈customer side
    always *looks* bigger): a driver-side collect + hash build of the
    largest table in the query, and exactly the side that stops fitting
    first at real scale. So the broadcast decision is made HERE, cost-based,
    from an honest bound Catalyst doesn't track: segment_orders is at most
    the orders scan, so broadcast it iff that scan's size estimate fits the
    session broadcast threshold. At 100 TB orders exceeds it and the join
    degrades to the correct shuffle join (which AQE may still upgrade from
    ACCURATE runtime sizes). orderBy+limit compiles to
    TakeOrderedAndProject — each partition keeps its local top-k, the driver
    merges k rows, no global sort materializes. Tie-broken by o_orderkey.
    """
    from airflow_etl_elt_spark.operators.aggregates import _plan_size_bytes

    segment_orders = (
        customer.filter(F.col("c_mktsegment") == segment)
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .select("o_orderkey", "o_orderdate")
    )
    threshold = int(
        orders.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
        .removesuffix("b")
    )
    from airflow_etl_elt_spark.operators.relational import fuse_small_input

    lineitem = lineitem.select("l_orderkey", "l_extendedprice", "l_discount")
    if colocated:
        # Both facts bucketed+sorted on the orderkey (the at-rest layout):
        # customer broadcasts INTO the bucketed orders scan (preserving its
        # partitioning/ordering), and the merge hint forces the SMJ that the
        # bucket metadata makes exchange-free AND sort-free — no fact-sized
        # hash relation is ever built, fresh or prepared. The broadcast/fuse
        # branch below is strictly worse here: it re-pays a segment-orders
        # hash build every fresh run.
        segment_orders = (
            F.broadcast(customer.filter(F.col("c_mktsegment") == segment))
            .join(orders, F.col("c_custkey") == F.col("o_custkey"))
            .select("o_orderkey", "o_orderdate")
            .hint("merge")
        )
    elif 0 < _plan_size_bytes(orders.select("o_orderkey", "o_orderdate")) < threshold:
        segment_orders = F.broadcast(segment_orders)
        # With the probe side broadcast, a fused-small lineitem turns the
        # whole query into one stage in fresh-build mode (gate no-ops in
        # prepared mode and above the size bound — the distributed shape).
        lineitem = fuse_small_input(lineitem)
    from airflow_etl_elt_spark.operators.aggregates import guarded_long_sum_agg

    # guarded_long_sum_agg: bit-identical to dec_sum's exact grid sum, but
    # the per-orderkey aggregation stays on primitive longs (high-cardinality
    # key — the two-tier form would re-pay a full state-volume exchange);
    # per-group totals are bounded by the guarded count×max|addend| check
    # (an orderkey has ≤7 lineitems at any SF). VERDICT r9 next-step 1.
    return (
        guarded_long_sum_agg(
            lineitem.join(
                segment_orders, F.col("o_orderkey") == F.col("l_orderkey")
            ),
            ["o_orderkey", "o_orderdate"],
            {"revenue": "(l_extendedprice * (1 - l_discount))"},
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(k)
    )
