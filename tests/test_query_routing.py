"""Auto-routing between broadcast and shuffle semi-join in q3 (the
broadcast-join threshold pattern; see also the canonicalization pair-bound
auto-route). Both routes must emit identical rows."""

import pandas as pd

import spacy_llm_ray.pipelines.queries as q

SF_DIR = "/root/testdata/sf0.001"


def _run_q3():
    out = q.q_q3_top_orders(SF_DIR)
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    return df.reset_index(drop=True)


def test_q3_broadcast_and_shuffle_routes_identical(ray_session, monkeypatch):
    # Tiny dimension -> broadcast route by default.
    broadcast = _run_q3()
    assert len(broadcast) == 10
    # Force the shuffle semi-join route (what a 100x dimension would take).
    monkeypatch.setattr(q, "BROADCAST_SEMI_MAX_BYTES", 0)
    shuffle = _run_q3()
    pd.testing.assert_frame_equal(broadcast, shuffle)


def test_revenue_by_nation_survives_aggregate_empty_blocks(
    ray_session, tmp_path, monkeypatch
):
    """Regression: groupby().aggregate() (like map_groups) emits SCHEMA-LESS
    empty blocks whenever its sort-shuffle has more output partitions than
    distinct keys, and a schema-less block on a hash-join side dies in the
    aggregator with ArrowInvalid (confirmed on Ray 2.49 with a 12-partition
    / 3-key probe). q_revenue_by_nation joins its per-customer aggregate
    against customer, so it must rebuild blocks first. Manufacture the
    failing shape: 12 orders part-files, 3 distinct custkeys, and a forced
    8-way join (at tiny bytes _join_partitions floors at 2, which can mask
    the crash when every join partition happens to catch a real row)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf = tmp_path / "sf"
    (sf / "orders.parquet").mkdir(parents=True)
    for i in range(12):
        pq.write_table(
            pa.table({
                "o_custkey": pa.array([i % 3 + 1], type=pa.int64()),
                "o_totalprice": pa.array([100.0 * (i + 1)]),
            }),
            str(sf / "orders.parquet" / f"part{i:02d}.parquet"),
        )
    pq.write_table(
        pa.table({"c_custkey": pa.array([1, 2, 3], type=pa.int64()),
                  "c_nationkey": pa.array([0, 0, 1], type=pa.int64())}),
        str(sf / "customer.parquet"),
    )
    pq.write_table(
        pa.table({"n_nationkey": pa.array([0, 1], type=pa.int64()),
                  "n_name": pa.array(["ALPHA", "BETA"])}),
        str(sf / "nation.parquet"),
    )
    monkeypatch.setattr(q, "_join_partitions", lambda *a, **k: 8)
    df = (
        q.q_revenue_by_nation(str(sf))
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    # custkey 1 gets rows i=0,3,6,9 -> 100+400+700+1000; custkey 2 gets
    # i=1,4,7,10 -> 200+500+800+1100; custkey 3 gets i=2,5,8,11 ->
    # 300+600+900+1200. ALPHA = cust 1+2, BETA = cust 3.
    assert df["n_name"].tolist() == ["ALPHA", "BETA"]
    assert df["total"].tolist() == [4800.0, 3000.0]
    assert df["n_orders"].tolist() == [8, 4]


def test_q3_survives_fully_filtered_orders_block(ray_session, tmp_path):
    """An orders parquet file whose rows ALL fail the date predicate
    produces a 0-row block that bypasses map_batches UDFs and keeps its
    3-column schema; without a plan-level projection the downstream
    lineitem hash join dies on mixed schemas (confirmed on Ray 2.49).
    Both routes must survive and agree."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf = tmp_path / "sf"
    (sf / "orders.parquet").mkdir(parents=True)
    early = pd.Timestamp("1997-06-01")
    late = pd.Timestamp("1998-06-01")  # fails o_orderdate < 1998-01-01
    pq.write_table(
        pa.table({"o_orderkey": pa.array([1, 2], type=pa.int64()),
                  "o_custkey": pa.array([10, 11], type=pa.int64()),
                  "o_orderdate": pa.array([early, early])}),
        str(sf / "orders.parquet" / "part0.parquet"),
    )
    pq.write_table(  # entirely filtered out -> the degenerate block
        pa.table({"o_orderkey": pa.array([3, 4], type=pa.int64()),
                  "o_custkey": pa.array([10, 12], type=pa.int64()),
                  "o_orderdate": pa.array([late, late])}),
        str(sf / "orders.parquet" / "part1.parquet"),
    )
    pq.write_table(
        pa.table({"c_custkey": pa.array([10, 11, 12], type=pa.int64()),
                  "c_mktsegment": pa.array(["BUILDING", "AUTOMOBILE",
                                            "BUILDING"])}),
        str(sf / "customer.parquet"),
    )
    pq.write_table(
        pa.table({
            "l_orderkey": pa.array([1, 2, 3], type=pa.int64()),
            "l_extendedprice": pa.array([100.0, 200.0, 300.0]),
            "l_discount": pa.array([0.1, 0.0, 0.2]),
            "l_shipdate": pa.array([pd.Timestamp("1998-02-01")] * 3),
        }),
        str(sf / "lineitem.parquet"),
    )
    out = q.q_q3_top_orders(str(sf))
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    # Order 1 (BUILDING cust 10, early order, post-1998 shipment) only:
    # order 2's customer is AUTOMOBILE; orders 3/4 fail the date filter.
    assert df["o_orderkey"].tolist() == [1]
    assert df["revenue"].tolist() == [90.0]
