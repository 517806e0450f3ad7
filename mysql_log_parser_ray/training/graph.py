"""Connected components over a near-duplicate pair graph.

The dedup-clustering primitive: near-dup detection (minhash / simhash /
ngram-jaccard) emits PAIRS; choosing one representative per duplicate
cluster needs the transitive closure — connected components with the
component's minimum doc_id as the canonical representative.

Algorithm: distributed min-label propagation. Every node starts labelled
with itself; each round a node adopts the minimum label among itself and
its neighbours; at fixpoint every node of a component carries the
component's minimum node id. Rounds needed = graph diameter — near-dup
clusters are shallow (pairs share content, so most clusters are cliques
or short chains), making plain propagation the right trade at this
graph shape. For adversarial web-scale graphs (long chains), swap the
round body for the large-star/small-star operators (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SOCC'14) — the same
bucket-collapse primitive, provably O(log^2 n) rounds.

Scale shape per round: ONE coarse shuffle keyed hash(node) % n_parts
carrying (node, candidate-label) rows (edges + current labels), a
vectorized pandas min per bucket, and a changed-row count folded from
bucket-cardinality partials. Nothing node- or edge-cardinality ever
lands on the driver; edges are tagged and materialized once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

def _union_find_driver(edges_ds, rd):
    """Driver union-find over a size-gated edge list: path-halving +
    union-by-min so the root of every set is its minimum node id."""
    parts = [
        b.to_pandas()
        for b in edges_ds.iter_batches(batch_size=None, batch_format="pyarrow")
    ]
    e = pd.concat(parts, ignore_index=True)
    nodes, inv = np.unique(
        np.concatenate([e["src"].to_numpy(), e["dst"].to_numpy()]),
        return_inverse=True,
    )
    n = len(nodes)
    src = inv[: len(e)]
    dst = inv[len(e):]
    parent = np.arange(n, dtype=np.int64)

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]  # path halving
            i = parent[i]
        return i

    for a, b in zip(src, dst):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            # union by min node id: nodes[] is sorted, so the smaller
            # index IS the smaller id — keep it as root
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    roots = np.array([find(i) for i in range(n)], dtype=np.int64)
    return rd.from_pandas(
        pd.DataFrame(
            {"node": nodes.astype(np.int64), "cluster_rep": nodes[roots]}
        )
    )


_EMPTY = pa.table(
    {
        "node": pa.array([], pa.int64()),
        "cand": pa.array([], pa.int64()),
        "_part": pa.array([], pa.int64()),
        "is_label": pa.array([], pa.int8()),
    }
)


def connected_components(
    pairs_ds,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    n_parts: int = 64,
    max_iter: int = 50,
    small_graph_limit: int | None = 2_000_000,
):
    """Return a Dataset of (node, cluster_rep) for every node appearing in
    ``pairs_ds`` — cluster_rep is the minimum node id of the component.

    ``pairs_ds`` is an undirected edge list (one row per pair, either
    orientation). Converges in diameter rounds; raises RuntimeError past
    ``max_iter`` (pathological chain — use large-star/small-star).

    Size gate (the ``pair_broadcast_limit`` pattern): a graph of up to
    ``small_graph_limit`` directed edge rows is folded on the driver with
    union-find — identical output, none of the per-round shuffle fixed
    costs (measured 8.7 s -> ~1 s on a 500-edge sf0.1 graph). Past the
    limit the label-propagation rounds run fully distributed; both paths
    are equality-pinned in tests.
    """
    import ray.data as rd

    from ..partition import stable_partition

    def _double(b: pa.Table) -> pa.Table:
        # upstream pair generators end in groupby/map_groups stages that
        # can emit schema-less empty blocks — guard and retype
        if a_col not in b.column_names:
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                    "_part": pa.array([], pa.int64()),
                }
            )
        a = b[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bb = b[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([a, bb])
        dst = np.concatenate([bb, a])
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "_part": pa.array(stable_partition(src, n_parts), pa.int64()),
            }
        )

    edges = pairs_ds.map_batches(
        _double, batch_format="pyarrow", batch_size=1 << 16
    ).materialize()

    empty = pd.DataFrame(
        {
            "node": pd.Series([], dtype="int64"),
            "cluster_rep": pd.Series([], dtype="int64"),
        }
    )
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_pandas(empty)

    if small_graph_limit is not None and n_edges <= small_graph_limit:
        return _union_find_driver(edges, rd)

    def _init_labels(b: pa.Table) -> pa.Table:
        nodes = np.unique(b["src"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "label": pa.array(nodes, pa.int64()),
                "_part": pa.array(stable_partition(nodes, n_parts), pa.int64()),
            }
        )

    def _dedupe_labels(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates("node")

    labels = (
        edges.map_batches(_init_labels, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(_dedupe_labels, batch_format="pandas")
        .materialize()
    )

    def _as_cand_from_labels(b: pa.Table) -> pa.Table:
        if "node" not in b.column_names:
            return _EMPTY
        n = len(b)
        return pa.table(
            {
                "node": b["node"],
                "cand": b["label"],
                "_part": b["_part"],
                "is_label": pa.array(np.ones(n, np.int8), pa.int8()),
            }
        )

    def _emit_neighbor_cands(g: pd.DataFrame) -> pd.DataFrame:
        # bucket keyed by hash(src) == hash(label-node): join this
        # bucket's labels onto its outgoing edges, emit the label as a
        # candidate for each neighbour (tagged for the NEXT shuffle)
        from ..partition import stable_partition as sp

        lab = g[g["kind"] == 1][["src", "dst"]].rename(
            columns={"src": "node", "dst": "label"}
        )
        e = g[g["kind"] == 0][["src", "dst"]]
        m = e.merge(lab, left_on="src", right_on="node", how="inner")
        out = pd.DataFrame(
            {
                "node": m["dst"].astype("int64"),
                "cand": m["label"].astype("int64"),
                "is_label": np.zeros(len(m), np.int8),
            }
        )
        out["_part"] = sp(out["node"], n_parts)
        # arrow out: this stream is union()ed with arrow-block streams and
        # Ray requires uniform block types across a union
        return pa.Table.from_pandas(
            out[["node", "cand", "_part", "is_label"]], preserve_index=False
        )

    def _min_label(g: pd.DataFrame):
        from ..partition import stable_partition as sp

        new = g.groupby("node", as_index=False)["cand"].min()
        old = g[g["is_label"] == 1][["node", "cand"]].rename(
            columns={"cand": "old"}
        )
        new = new.merge(old, on="node", how="left")
        changed = (new["cand"] != new["old"]).to_numpy()
        out = pd.DataFrame(
            {
                "node": new["node"].astype("int64"),
                "label": new["cand"].astype("int64"),
                "changed": changed.astype("int8"),
            }
        )
        out["_part"] = sp(out["node"], n_parts)
        return pa.Table.from_pandas(
            out[["node", "label", "_part", "changed"]], preserve_index=False
        )

    for _ in range(max_iter):
        # stage A (bucketed by src): edges kind=0, labels kind=1 share one
        # shuffle; stage B (bucketed by node): neighbour candidates + the
        # node's own label fold to the per-node min
        def _edge_rows(b: pa.Table) -> pa.Table:
            if "src" not in b.column_names:
                return pa.table(
                    {
                        "src": pa.array([], pa.int64()),
                        "dst": pa.array([], pa.int64()),
                        "_part": pa.array([], pa.int64()),
                        "kind": pa.array([], pa.int8()),
                    }
                )
            return b.append_column(
                "kind", pa.array(np.zeros(len(b), np.int8), pa.int8())
            )

        def _label_rows(b: pa.Table) -> pa.Table:
            if "node" not in b.column_names:
                return pa.table(
                    {
                        "src": pa.array([], pa.int64()),
                        "dst": pa.array([], pa.int64()),
                        "_part": pa.array([], pa.int64()),
                        "kind": pa.array([], pa.int8()),
                    }
                )
            return pa.table(
                {
                    "src": b["node"],
                    "dst": b["label"],
                    "_part": b["_part"],
                    "kind": pa.array(np.ones(len(b), np.int8), pa.int8()),
                }
            )

        cands = (
            edges.map_batches(_edge_rows, batch_format="pyarrow", batch_size=None)
            .union(
                labels.map_batches(
                    _label_rows, batch_format="pyarrow", batch_size=None
                )
            )
            .groupby("_part")
            .map_groups(_emit_neighbor_cands, batch_format="pandas")
        )
        self_cands = labels.map_batches(
            _as_cand_from_labels, batch_format="pyarrow", batch_size=None
        )
        new_labels = (
            cands.union(self_cands)
            .groupby("_part")
            .map_groups(_min_label, batch_format="pandas")
            .materialize()
        )
        n_changed = int(new_labels.sum("changed") or 0)
        labels = new_labels.drop_columns(["changed"]).materialize()
        if n_changed == 0:
            return labels.drop_columns(["_part"]).rename_columns(
                {"label": "cluster_rep"}
            )
    raise RuntimeError(
        f"connected_components: no fixpoint after {max_iter} rounds "
        "(pathological chain graph) - switch to large-star/small-star"
    )


def pagerank_integer(
    pairs_ds,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    n_iter: int = 5,
    scale: int = 10**9,
    damp_num: int = 17,
    damp_den: int = 20,
    n_parts: int = 64,
    small_graph_limit: int | None = 2_000_000,
):
    """Fixed-iteration PageRank over an undirected pair graph, in EXACT
    integer arithmetic: ranks live in 1e-9 "scale units", every damped
    contribution is the floor (damp_num * r) // (damp_den * deg) and the
    per-node base is (scale * (damp_den - damp_num)) // damp_den — so the
    result is bit-identical across runs, num_cpus, and engines (no float
    summation anywhere; integer sums are order-independent). Unnormalized
    convention: per-node fixpoint mass averages ~`scale`, total ~N*scale.

    Returns a Dataset of (node, out_degree, pr_units) for every node with
    at least one edge. Same two-stage-per-round shuffle shape as
    connected_components (edges and state co-bucketed by hash(src), then
    contributions re-bucketed by hash(dst)); the driver path under
    ``small_graph_limit`` directed edges is equality-pinned to the
    distributed path in tests. Raises OverflowError when a rank would
    overflow damp_num * r in int64 (the oracle's BIGINT multiply raises
    there too)."""
    import ray.data as rd

    from ..partition import stable_partition

    base = (scale * (damp_den - damp_num)) // damp_den
    r_cap = (2**63 - 1) // damp_num

    def _double(b: pa.Table) -> pa.Table:
        if a_col not in b.column_names:
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                    "_part": pa.array([], pa.int64()),
                }
            )
        a = b[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bb = b[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([a, bb])
        dst = np.concatenate([bb, a])
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "_part": pa.array(stable_partition(src, n_parts), pa.int64()),
            }
        )

    edges = pairs_ds.map_batches(
        _double, batch_format="pyarrow", batch_size=1 << 16
    ).materialize()

    empty = pd.DataFrame(
        {
            "node": pd.Series([], dtype="int64"),
            "out_degree": pd.Series([], dtype="int64"),
            "pr_units": pd.Series([], dtype="int64"),
        }
    )
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_pandas(empty)

    if small_graph_limit is not None and n_edges <= small_graph_limit:
        e = edges.to_pandas()
        src = e["src"].to_numpy(np.int64)
        dst = e["dst"].to_numpy(np.int64)
        nodes, src_ix = np.unique(src, return_inverse=True)
        dst_ix = np.searchsorted(nodes, dst)  # same node set (symmetric)
        deg = np.bincount(src_ix, minlength=len(nodes)).astype(np.int64)
        r = np.full(len(nodes), scale // len(nodes), np.int64)
        for _ in range(n_iter):
            if int(r.max()) > r_cap:
                raise OverflowError(
                    "pagerank_integer: rank exceeds int64/damp_num")
            contrib = (damp_num * r[src_ix]) // (damp_den * deg[src_ix])
            acc = np.zeros(len(nodes), np.int64)
            np.add.at(acc, dst_ix, contrib)
            r = base + acc
        return rd.from_pandas(
            pd.DataFrame(
                {"node": nodes, "out_degree": deg, "pr_units": r}
            )
        )

    def _deg_rows(g: pd.DataFrame) -> pd.DataFrame:
        from ..partition import stable_partition as sp

        d = g.groupby("src", as_index=False).size().rename(
            columns={"src": "node", "size": "deg"}
        )
        d["deg"] = d["deg"].astype("int64")
        d["node"] = d["node"].astype("int64")
        d["_part"] = sp(d["node"], n_parts)
        return pa.Table.from_pandas(
            d[["node", "deg", "_part"]], preserve_index=False
        )

    deg = (
        edges.groupby("_part")
        .map_groups(_deg_rows, batch_format="pandas")
        .materialize()
    )
    n_nodes = deg.count()
    r0 = scale // n_nodes

    def _state0(b: pa.Table) -> pa.Table:
        if "node" not in b.column_names:
            return pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "deg": pa.array([], pa.int64()),
                    "r": pa.array([], pa.int64()),
                    "_part": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "node": b["node"],
                "deg": b["deg"],
                "r": pa.array(np.full(len(b), r0, np.int64), pa.int64()),
                "_part": b["_part"],
            }
        )

    state = deg.map_batches(
        _state0, batch_format="pyarrow", batch_size=None
    ).materialize()

    _UNIFIED = pa.table(
        {
            "src": pa.array([], pa.int64()),
            "x": pa.array([], pa.int64()),
            "y": pa.array([], pa.int64()),
            "_part": pa.array([], pa.int64()),
            "kind": pa.array([], pa.int8()),
        }
    )

    def _edge_rows(b: pa.Table) -> pa.Table:
        if "src" not in b.column_names:
            return _UNIFIED
        n = len(b)
        return pa.table(
            {
                "src": b["src"],
                "x": b["dst"],
                "y": pa.array(np.zeros(n, np.int64), pa.int64()),
                "_part": b["_part"],
                "kind": pa.array(np.zeros(n, np.int8), pa.int8()),
            }
        )

    def _state_rows(b: pa.Table) -> pa.Table:
        if "node" not in b.column_names:
            return _UNIFIED
        n = len(b)
        return pa.table(
            {
                "src": b["node"],
                "x": b["deg"],
                "y": b["r"],
                "_part": b["_part"],
                "kind": pa.array(np.ones(n, np.int8), pa.int8()),
            }
        )

    def _emit_contribs(g: pd.DataFrame) -> pa.Table:
        from ..partition import stable_partition as sp

        st = g[g["kind"] == 1][["src", "x", "y"]].rename(
            columns={"src": "node", "x": "deg", "y": "r"}
        )
        if len(st) and int(st["r"].max()) > r_cap:
            raise OverflowError(
                "pagerank_integer: rank exceeds int64/damp_num")
        e = g[g["kind"] == 0][["src", "x"]].rename(columns={"x": "dst"})
        m = e.merge(st, left_on="src", right_on="node", how="inner")
        contrib = (
            damp_num * m["r"].to_numpy(np.int64)
        ) // (damp_den * m["deg"].to_numpy(np.int64))
        out = pd.DataFrame(
            {
                "node": m["dst"].astype("int64"),
                "contrib": contrib.astype(np.int64),
            }
        )
        out["_part"] = sp(out["node"], n_parts)
        return pa.Table.from_pandas(
            out[["node", "contrib", "_part"]], preserve_index=False
        )

    def _contrib_rows(b: pa.Table) -> pa.Table:
        if "contrib" not in b.column_names:
            return _UNIFIED
        n = len(b)
        return pa.table(
            {
                "src": b["node"],
                "x": b["contrib"],
                "y": pa.array(np.zeros(n, np.int64), pa.int64()),
                "_part": b["_part"],
                "kind": pa.array(np.zeros(n, np.int8), pa.int8()),
            }
        )

    def _fold_state(g: pd.DataFrame) -> pa.Table:
        from ..partition import stable_partition as sp

        d = g[g["kind"] == 1][["src", "x"]].rename(
            columns={"src": "node", "x": "deg"}
        )
        c = (
            g[g["kind"] == 0]
            .groupby("src", as_index=False)["x"]
            .sum()
            .rename(columns={"src": "node", "x": "s"})
        )
        m = d.merge(c, on="node", how="left")
        r_new = base + m["s"].fillna(0).to_numpy(np.int64)
        out = pd.DataFrame(
            {
                "node": m["node"].astype("int64"),
                "deg": m["deg"].astype("int64"),
                "r": r_new.astype(np.int64),
            }
        )
        out["_part"] = sp(out["node"], n_parts)
        return pa.Table.from_pandas(
            out[["node", "deg", "r", "_part"]], preserve_index=False
        )

    for _ in range(n_iter):
        contribs = (
            edges.map_batches(_edge_rows, batch_format="pyarrow",
                              batch_size=None)
            .union(state.map_batches(_state_rows, batch_format="pyarrow",
                                     batch_size=None))
            .groupby("_part")
            .map_groups(_emit_contribs, batch_format="pandas")
        )
        state = (
            contribs.map_batches(_contrib_rows, batch_format="pyarrow",
                                 batch_size=None)
            .union(deg.map_batches(_state_rows_from_deg(_UNIFIED),
                                   batch_format="pyarrow",
                                   batch_size=None))
            .groupby("_part")
            .map_groups(_fold_state, batch_format="pandas")
            .materialize()
        )

    def _final(b: pa.Table) -> pa.Table:
        if "node" not in b.column_names:
            return pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "out_degree": pa.array([], pa.int64()),
                    "pr_units": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "node": b["node"],
                "out_degree": b["deg"],
                "pr_units": b["r"],
            }
        )

    return state.map_batches(_final, batch_format="pyarrow",
                             batch_size=None)


def _state_rows_from_deg(unified):
    """Deg rows tagged kind=1 for the stage-B union (node, deg)."""

    def _fn(b: pa.Table) -> pa.Table:
        if "node" not in b.column_names:
            return unified
        n = len(b)
        return pa.table(
            {
                "src": b["node"],
                "x": b["deg"],
                "y": pa.array(np.zeros(n, np.int64), pa.int64()),
                "_part": b["_part"],
                "kind": pa.array(np.ones(n, np.int8), pa.int8()),
            }
        )

    return _fn
