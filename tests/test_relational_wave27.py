"""Unit tests for the wave-27 pair: grouped value Gini per type and
supplier part-diversity histogram (hand-computed fixtures)."""

import pyarrow as pa
import pyarrow.parquet as pq


def test_value_gini_per_type_hand_computed(ray_session, tmp_path):
    # type A values [1, 1, 2] dollars: n=3 sx=400 cents
    #   sorted ranks: 100(1),100(2),200(3) -> srx = 100+200+600 = 900
    #   gini = (2*900 - 4*400) / (3*400) = 200/1200 = 0.166667
    # type B single value -> gini 0
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(4), pa.int64()),
                "ts": pa.array([0] * 4, pa.timestamp("us")),
                "user_id": pa.array([1] * 4, pa.int64()),
                "event_type": pa.array(["A", "A", "A", "B"]),
                "value": pa.array([1.0, 2.0, 1.0, 5.0]),
                "props": pa.array(["{}"] * 4),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import (
        q_events_value_gini_per_type,
    )

    out = q_events_value_gini_per_type(str(tmp_path))
    got = {r.event_type: (r.n_events, r.total_cents, r.gini)
           for r in out.itertuples()}
    assert got == {"A": (3, 400, 0.166667), "B": (1, 500, 0.0)}


def test_part_diversity_bins(ray_session, tmp_path):
    # supp 1 ships 1 distinct part (bin 0), supp 2 ships 2 (bin 1),
    # supp 3 ships 4 (bin 2); duplicate pairs must not double-count
    pairs = [(1, 7), (1, 7), (2, 1), (2, 2), (3, 1), (3, 2), (3, 3),
             (3, 4)]
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(range(len(pairs)), pa.int64()),
                "l_partkey": pa.array([p for _, p in pairs], pa.int64()),
                "l_suppkey": pa.array([s for s, _ in pairs], pa.int64()),
                "l_quantity": pa.array([1.0] * len(pairs)),
                "l_extendedprice": pa.array([1.0] * len(pairs)),
                "l_discount": pa.array([0.0] * len(pairs)),
                "l_tax": pa.array([0.0] * len(pairs)),
                "l_returnflag": pa.array(["N"] * len(pairs)),
                "l_shipdate": pa.array([0] * len(pairs),
                                       pa.timestamp("us")),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    from mysql_log_parser_ray.pipelines.queries import (
        q_supplier_part_diversity,
    )

    out = q_supplier_part_diversity(str(tmp_path))
    got = dict(zip(out["bin"], out["n_suppliers"]))
    assert got == {0: 1, 1: 1, 2: 1}
