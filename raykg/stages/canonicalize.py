"""Stage 8: canonicalization — the explicit shuffle, done the scale-safe way.

Physical plan (SURVEY.md §7.2-7.3):

1. **Partial aggregation inside map_batches** (combiner): each batch of
   mention rows collapses to ≤ one row per (normalized surface) carrying
   partial count, per-label counts and an alias sample — so the shuffle moves
   aggregates, not mentions.
2. **Salted phase**: partials group by ``(norm, salt)`` first (S-way split of
   hot keys — Zipf-skewed entities are the norm in web text), then by
   ``norm`` for the final merge. Salting changes only grouping topology;
   the merge is associative + commutative + deterministically finalized, so
   results are independent of batch boundaries and parallelism.
3. **node_id is a content hash** of the canonical surface
   (raykg.core.canonical.node_id): downstream stages map surfaces to node ids
   with a pure function — the triples→nodes "join" costs ZERO shuffle.

Alias merging (connected components) lives in this module too: candidate
near-duplicate surface pairs come from TOKEN BLOCKING (one bucket per word
of the canonical surface — sign-bit hyperplane LSH was measured at <10% pair
recall at these surface lengths and replaced) verified by trigram cosine;
components are resolved adaptively (``alias_components``): driver union-find
while the measured pair count fits a budget, distributed min-label
propagation beyond it (SURVEY.md §7.3).
"""

from __future__ import annotations

import json
from hashlib import blake2b

import numpy as np
import pandas as pd
import pyarrow as pa

from ..core.canonical import (SurfaceEmbedder, UnionFind, node_id,
                              surface_key)
# module top, NOT inside the UDF: a function-body relative import defeats
# cloudpickle's by-value shipping and fails only when the driver imported
# raykg from a foreign cwd (the hostile-cwd scenario in the verify skill)
from .graph import _dict_codes

DEFAULT_SALTS = 16
_MAX_ALIASES = 16


def partial_canonical(batch: pa.Table, salts: int = DEFAULT_SALTS) -> pa.Table:
    """Combiner: mention rows → partial (norm, salt, count, label_counts_json,
    aliases_json) rows. Runs inside map_batches; no shuffle yet.

    Vectorized via dictionary encoding: the row axis stays int codes inside
    Arrow/pandas; Python touches only the DISTINCT surfaces/labels (Zipf ⇒
    few per block — row-level ``to_pylist`` was a top Python cost of the
    canonicalize phase at ×96 scale)."""
    t_codes, t_vals = _dict_codes(batch.column("text"))
    l_codes, l_vals = _dict_codes(batch.column("label"))
    norm_of = [surface_key(s)[0] for s in t_vals]       # distinct-level
    valid = np.array([n != "" for n in norm_of], dtype=bool)
    mask = valid[t_codes] if len(t_codes) else np.zeros(0, dtype=bool)
    df = pd.DataFrame({"t": t_codes[mask], "l": l_codes[mask]})
    acc: dict[str, tuple[int, dict, set]] = {}
    # per-DISTINCT-key python: counts via vectorized code groupbys
    for (t, l), cnt in df.groupby(["t", "l"]).size().items():
        norm = norm_of[t]
        got = acc.get(norm)
        if got is None:
            got = acc[norm] = [0, {}, set()]
        got[0] += int(cnt)
        got[1][l_vals[l]] = got[1].get(l_vals[l], 0) + int(cnt)
        # alias sample = lexicographically SMALLEST _MAX_ALIASES of the
        # batch's distinct surfaces (trimmed at emit below): min-k is a
        # semilattice, so every downstream min-k-of-union layer is
        # independent of batch boundaries — a first-k sample in iteration
        # order was not (ADVICE r1)
        got[2].add(t_vals[t])
    norms = sorted(acc)
    first = t_vals[t_codes[0]] if len(t_codes) else ""
    return pa.table({
        "norm": pa.array(norms, pa.string()),
        # salt spreads a hot key's partials across S groups; deterministic in
        # content only, and irrelevant to the final result (merge is assoc.)
        "salt": pa.array(
            [int.from_bytes(blake2b((n + "|" + first).encode(), digest_size=4)
                            .digest(), "big") % salts for n in norms], pa.int32()),
        "count": pa.array([acc[n][0] for n in norms], pa.int64()),
        "label_counts": pa.array(
            [json.dumps(acc[n][1], sort_keys=True) for n in norms], pa.string()),
        "aliases": pa.array(
            [json.dumps(sorted(acc[n][2])[:_MAX_ALIASES]) for n in norms],
            pa.string()),
    })


def _merge_rows(groups: "pd.core.groupby.DataFrameGroupBy",
                finalize: bool) -> pd.DataFrame:
    """Merge partial rows per key (vectorized count sum; JSON state merged
    per key — keys, not rows, bound the Python work)."""
    counts = groups["count"].sum()
    rows = {"norm": [], "salt": [], "count": [], "label_counts": [], "aliases": []}
    final_rows = {"node_id": [], "canonical": [], "label": [], "aliases": [],
                  "mention_count": []}
    for key, sub in groups:
        norm = key[0] if isinstance(key, tuple) else key
        lc: dict[str, int] = {}
        al: set[str] = set()
        for s in sub["label_counts"]:
            for k, v in json.loads(s).items():
                lc[k] = lc.get(k, 0) + v
        for s in sub["aliases"]:
            al.update(json.loads(s))
        al_sorted = sorted(al)[:_MAX_ALIASES]
        if finalize:
            label = max(lc.items(), key=lambda kv: (kv[1], kv[0]))[0] if lc else ""
            final_rows["node_id"].append(node_id(norm))
            final_rows["canonical"].append(norm)
            final_rows["label"].append(label)
            final_rows["aliases"].append(al_sorted)
            final_rows["mention_count"].append(int(counts.loc[key]))
        else:
            rows["norm"].append(norm)
            rows["salt"].append(0)
            rows["count"].append(int(counts.loc[key]))
            rows["label_counts"].append(json.dumps(lc, sort_keys=True))
            rows["aliases"].append(json.dumps(al_sorted))
    return pd.DataFrame(final_rows if finalize else rows)


def canonicalize(mentions_ds, salts: int = DEFAULT_SALTS, num_buckets: int = 32):
    """mentions Dataset → nodes Dataset (pre-alias-merge).

    Three-layer aggregation, each layer bounding the next:
      1. in-batch combiner (partial_canonical) — the shuffle moves partials,
         not mentions;
      2. SALTED merge: bucketized groupby on (norm, salt) — a hot surface's
         partials (≤ one per batch) are first collapsed S-ways in parallel;
      3. final bucketized groupby on (norm) over ≤ S rows per key.
    Both groupbys use the bucketized pattern (raykg.stages.shuffle): one
    vectorized pandas call per hash bucket, never one call per key."""
    from .shuffle import DRIVER_MERGE_BUDGET, DRIVER_MERGE_BYTES, bucketed_group_apply

    # batch_size=None → whole-block combining (small batches barely combine
    # and multiply the shuffle's partial-row count)
    partials = mentions_ds.map_batches(
        lambda b: partial_canonical(b, salts), batch_format="pyarrow",
        batch_size=None).materialize()

    def merge_salted(df: pd.DataFrame) -> pd.DataFrame:
        return _merge_rows(df.groupby(["norm", "salt"], sort=True), False)

    def merge_final(df: pd.DataFrame) -> pd.DataFrame:
        return _merge_rows(df.groupby("norm", sort=True), True)

    # Below the driver budget both merge layers land on the driver anyway —
    # compose them into ONE grouped apply (bucketing by norm co-locates all
    # of a norm's salted partials, so merge_salted-then-merge_final inside
    # one call is the identical dataflow minus one whole dataset execution
    # round-trip, ~1-2s of fixed constants per run). The salted TWO-PHASE
    # stays the beyond-budget path: splitting a hot norm's partials S ways
    # in parallel is the thing the composition gives up.
    n = partials.count()
    if 0 < n <= DRIVER_MERGE_BUDGET and partials.size_bytes() <= DRIVER_MERGE_BYTES:
        return bucketed_group_apply(
            partials, ["norm"],
            lambda df: merge_final(merge_salted(df)), num_buckets)
    merged = bucketed_group_apply(partials, ["norm", "salt"], merge_salted,
                                  num_buckets)
    return bucketed_group_apply(merged, ["norm"], merge_final, num_buckets)


# ---------------------------------------------------------------------------
# alias merging: connected components over near-duplicate surface pairs
# ---------------------------------------------------------------------------

_MAX_BUCKET = 2000   # frequent-token buckets carry no signal; cap = skew guard


def _blocking_keys(batch: pa.Table) -> pa.Table:
    """Token blocking (standard entity-resolution blocking): a canonical
    surface lands in one bucket per word token. Near-dup surfaces ("helios
    dynamics" / "helios dynamics inc") share ≥1 token with probability ~1 —
    far better recall than sign-bit hyperplane LSH at these lengths (which
    was measured at <10% pair recall and replaced). Bucket sizes are bounded
    by token document-frequency; the pairwise stage drops buckets above
    ``_MAX_BUCKET`` (a stopword-like token tells nothing about identity)."""
    out_bucket: list[str] = []
    out_id: list[int] = []
    out_canon: list[str] = []
    ids = batch.column("node_id").to_pylist()
    canonicals = batch.column("canonical").to_pylist()
    for nid, canon in zip(ids, canonicals):
        for tok in set(canon.split()):
            out_bucket.append(tok)
            out_id.append(nid)
            out_canon.append(canon)
    return pa.table({
        "bucket": pa.array(out_bucket, pa.string()),
        "node_id": pa.array(out_id, pa.int64()),
        "canonical": pa.array(out_canon, pa.string()),
    })


def alias_pairs(nodes_ds, cos_threshold: float = 0.80, seed: int = 42):
    """nodes → candidate alias edges (a_id, b_id).

    Pair rule: FIRST TOKEN EQUAL and trigram cosine ≥ threshold. The cosine
    alone over-merges: same-suffix different-brand surfaces ("atlas
    industries" / "helios industries") score ≈0.7 and shared generic
    surfaces transitively bridge whole families — measured on the corpus
    before the first-token constraint was added. Corporate-designator
    variants never reach here at all (normalize_surface strips them).
    groupby(bucket) moves one small row per (surface, token); pairs found in
    several buckets are harmless — union-find is idempotent."""
    from .shuffle import bucketed_group_apply

    buckets = nodes_ds.select_columns(["node_id", "canonical"]) \
        .map_batches(_blocking_keys, batch_format="pyarrow")
    embedder_seed = seed

    def pairs_in_hash_bucket(df: pd.DataFrame) -> pd.DataFrame:
        emb = SurfaceEmbedder(embedder_seed)
        aa, bb = [], []
        for _, g in df.groupby("bucket", sort=True):
            if len(g) < 2 or len(g) > _MAX_BUCKET:
                continue
            surfs = list(g["canonical"])
            ids = list(g["node_id"])
            m = emb.embed_many(surfs)
            sims = m @ m.T
            first = [s.split(" ", 1)[0] for s in surfs]
            ii, jj = np.nonzero(np.triu(sims >= cos_threshold, k=1))
            for i, j in zip(ii, jj):
                if first[i] == first[j]:        # anti-bridge constraint
                    aa.append(int(ids[i]))
                    bb.append(int(ids[j]))
        return pd.DataFrame({"a": pd.Series(aa, dtype="int64"),
                             "b": pd.Series(bb, dtype="int64")})

    return bucketed_group_apply(buckets, ["bucket"], pairs_in_hash_bucket)


def alias_components(pairs_ds, driver_budget: int = 2_000_000) -> dict[int, int]:
    """Adaptive connected components: union-find on the driver while the
    candidate-pair set fits the budget; distributed min-label propagation
    beyond it (SURVEY.md §7.3 — 'choose by measured edge count; both paths
    implemented behind one interface'). The returned rewrite map is bounded
    by the number of MERGED surfaces, not pairs; a deployment where even
    that exceeds driver memory applies the (node, root) Dataset via a
    bucketized join instead of a broadcast dict — same downstream shape."""
    pairs_mat = pairs_ds.materialize()
    n = pairs_mat.count()
    if n <= driver_budget:
        return components_driver(pairs_mat)
    labels = components_distributed(pairs_mat)
    out: dict[int, int] = {}
    for batch in labels.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for node, root in zip(batch.column("node").to_pylist(),
                              batch.column("root").to_pylist()):
            if node != root:
                out[int(node)] = int(root)
    # defensive path compression: converged min-label output has no chains
    # (root is the component minimum), so this is a no-op unless upstream
    # semantics ever regress — cheap insurance on a merged-surface-sized map
    for k in list(out):
        r = out[k]
        while r in out:
            r = out[r]
        out[k] = r
    return out


def alias_components_auto(pairs_ds, driver_budget: int = 2_000_000,
                          map_budget: int = 20_000_000):
    """Size-adaptive alias resolution (VERDICT r2 #7): returns a plain dict
    while the merged-surface map fits the driver (``apply_alias_merge`` /
    ``finalize_edges`` broadcast it), and a (node, root) DATASET beyond
    ``map_budget`` (the same two functions then run their bucketized-join
    path — the map never touches the driver). Both representations produce
    byte-identical nodes/edges (pytest-pinned)."""
    pairs_mat = pairs_ds.materialize()
    if pairs_mat.count() <= driver_budget:
        return components_driver(pairs_mat)
    labels = components_distributed(pairs_mat)

    def merged_only(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.invert(pc.equal(b.column("node"),
                                           b.column("root"))))

    merged = labels.map_batches(merged_only,
                                batch_format="pyarrow").materialize()
    if merged.count() <= map_budget:
        out: dict[int, int] = {}
        for batch in merged.iter_batches(batch_size=65536,
                                         batch_format="pyarrow"):
            for node, root in zip(batch.column("node").to_pylist(),
                                  batch.column("root").to_pylist()):
                out[int(node)] = int(root)
        return out
    return merged


def components_driver(pairs_ds) -> dict[int, int]:
    """Union-find on the driver. Bounded by the candidate-pair count (pairs
    exist only among near-duplicate distinct surfaces), NOT corpus size —
    measured, not assumed: callers should check ``pairs_ds.count()`` first
    and fall back to ``components_distributed`` beyond a budget."""
    uf = UnionFind()
    for batch in pairs_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for a, b in zip(batch.column("a").to_pylist(), batch.column("b").to_pylist()):
            uf.union(a, b)
    return {k: v for k, v in uf.components().items() if k != v}


def components_distributed(pairs_ds, max_rounds: int = 64):
    """Connected components by distributed min-label propagation WITH pointer
    jumping — the scale path when the pair set exceeds driver memory.

    Everything stays a Dataset: labels are never collected to the driver,
    relabeling is a bucketized hash-join (edge rows and label rows
    co-located by the join key in one hash bucket), and the per-round merge
    is ``bucketed_named_agg(min)`` — one vectorized pandas call per bucket
    (round 1 pulled every (node, root) row into a driver dict per iteration
    and relabeled via one-group-per-node map_groups; both anti-patterns are
    gone). Pointer jumping (each round also propagates root ← root-of-root)
    makes convergence O(log diameter) rounds instead of O(diameter).

    Convergence is CHECKED (a distributed changed-row count), not assumed:
    the loop runs until a fixpoint and raises if ``max_rounds`` (a safety
    valve far above log2 of any real component) is hit first — a truncated
    label set would silently split components (ADVICE round 1).

    Returns a Dataset of (node, root); root < node only for merged nodes."""
    from .shuffle import bucketed_group_apply, bucketed_named_agg

    _KEYED = pa.schema([("key", pa.int64()), ("node", pa.int64()),
                        ("root", pa.int64()), ("is_label", pa.int32())])

    def expand_cands(b: pa.Table) -> pa.Table:
        """pairs → initial candidate rows (node, cand): both directions +
        self-loops, so every endpoint gets a label in round 0."""
        a = b.column("a").to_pylist()
        bb = b.column("b").to_pylist()
        return pa.table({"node": pa.array(a + bb + a + bb, pa.int64()),
                         "cand": pa.array(bb + a + a + bb, pa.int64())})

    def edge_key_rows(b: pa.Table) -> pa.Table:
        """edges → join-probe rows keyed by the neighbor whose root we want."""
        a = b.column("a").to_pylist()
        bb = b.column("b").to_pylist()
        n = len(a) * 2
        return pa.table({"key": pa.array(bb + a, pa.int64()),
                         "node": pa.array(a + bb, pa.int64()),
                         "root": pa.array([0] * n, pa.int64()),
                         "is_label": pa.array([0] * n, pa.int32())},
                        schema=_KEYED)

    def label_build_rows(b: pa.Table) -> pa.Table:
        """labels → join-build rows keyed by node, plus pointer-jump probe
        rows keyed by root (yield cand = root-of-root)."""
        nodes = b.column("node").to_pylist()
        roots = b.column("root").to_pylist()
        n = len(nodes)
        return pa.table({"key": pa.array(nodes + roots, pa.int64()),
                         "node": pa.array(nodes + nodes, pa.int64()),
                         "root": pa.array(roots + [0] * n, pa.int64()),
                         "is_label": pa.array([1] * n + [0] * n, pa.int32())},
                        schema=_KEYED)

    def join_roots(df: pd.DataFrame) -> pd.DataFrame:
        """One hash bucket: label rows (is_label=1) build the key→root map;
        probe rows look it up (vectorized searchsorted — int64-exact, no
        per-row Python); label rows ALSO re-emit their own (node, root) so
        the min-agg sees every node's current label without a separate
        union pass."""
        from .graph import rewrite_ids, sorted_id_map

        lab = df[df["is_label"] == 1]
        keys, roots = sorted_id_map((lab["key"].to_numpy(),
                                     lab["root"].to_numpy()))
        probe = df[df["is_label"] == 0]
        looked = rewrite_ids(probe["key"].to_numpy(), keys, roots)
        return pd.DataFrame({
            "node": np.concatenate([probe["node"].to_numpy(),
                                    lab["node"].to_numpy()]).astype("int64"),
            "cand": np.concatenate([looked,
                                    lab["root"].to_numpy()]).astype("int64")})

    def fingerprint(ds) -> int:
        """Order-independent label-set fingerprint: per-batch XOR of
        h64(node|root) partials, XOR-combined on the driver — one streaming
        map, no shuffle, and a tiny (one row per block) collect."""
        def fp(b: pa.Table) -> pa.Table:
            import numpy as _np

            nodes = _np.asarray(b.column("node").to_pylist(), dtype=_np.uint64)
            roots = _np.asarray(b.column("root").to_pylist(), dtype=_np.uint64)
            # splitmix-style per-row mix, XOR-reduced (assoc+comm)
            x = (nodes * _np.uint64(0x9E3779B97F4A7C15)) ^ \
                (roots * _np.uint64(0xBF58476D1CE4E5B9))
            x ^= x >> _np.uint64(31)
            acc = _np.bitwise_xor.reduce(x) if len(x) else _np.uint64(0)
            return pa.table({"fp": pa.array([int(acc) & 0x7FFFFFFFFFFFFFFF],
                                            pa.int64())})

        out = 0
        for row in ds.map_batches(fp, batch_format="pyarrow",
                                  batch_size=None).take_all():
            out ^= row["fp"]
        return out

    pairs_mat = pairs_ds.materialize()
    labels = bucketed_named_agg(
        pairs_mat.map_batches(expand_cands, batch_format="pyarrow"),
        ["node"], {"root": ("cand", "min")}).materialize()
    probes = pairs_mat.map_batches(edge_key_rows,
                                   batch_format="pyarrow").materialize()
    prev_fp = fingerprint(labels)

    for _ in range(max_rounds):
        builds = labels.map_batches(label_build_rows, batch_format="pyarrow")
        cands = bucketed_group_apply(probes.union(builds), ["key"], join_roots)
        labels = bucketed_named_agg(cands, ["node"],
                                    {"root": ("cand", "min")}).materialize()
        new_fp = fingerprint(labels)
        if new_fp == prev_fp:
            # roots are monotone non-increasing per node, so an equal
            # fingerprint means an identical label set (up to h64 collision)
            return labels
        prev_fp = new_fp
    raise RuntimeError(
        f"components_distributed did not converge in {max_rounds} rounds")


def _remerge_nodes(df: pd.DataFrame) -> pd.DataFrame:
    """Re-merge node rows sharing a (rewritten) node_id: deterministic
    canonical winner (most mentions, ties by lexicographic surface), alias
    union capped at _MAX_ALIASES, label by summed mention votes. Shared by
    the broadcast-dict AND bucketized-join alias paths, so the two are
    byte-identical by construction."""
    out = {"node_id": [], "canonical": [], "label": [], "aliases": [],
           "mention_count": []}
    for nid, g in df.groupby("node_id", sort=True):
        g2 = g.sort_values(["mention_count", "canonical"],
                           ascending=[False, True], kind="stable")
        canon = g2["canonical"].iloc[0]
        # parens matter: exclude the winner from the WHOLE union — without
        # them '-' binds before '|' and a raw alias equal to the winning
        # canonical sneaks back in, listing the node as its own alias
        aliases = sorted(({a for al in g2["aliases"] for a in al} |
                          set(g2["canonical"])) - {canon})[:_MAX_ALIASES]
        lc: dict[str, int] = {}
        for lab, cnt in zip(g2["label"], g2["mention_count"]):
            lc[lab] = lc.get(lab, 0) + int(cnt)
        out["node_id"].append(int(nid))
        out["canonical"].append(canon)
        out["label"].append(max(lc.items(), key=lambda kv: (kv[1], kv[0]))[0])
        out["aliases"].append(aliases)
        out["mention_count"].append(int(g2["mention_count"].sum()))
    return pd.DataFrame(out)


def apply_alias_merge(nodes_ds, alias_map):
    """Rewrite node rows through the alias map and re-merge the affected
    rows. Unaffected nodes (the overwhelming majority) stream through
    untouched — only rows whose id is a key OR root of the alias map enter
    the (bucketized) regroup.

    ``alias_map`` is either a broadcastable dict (node → root) or a
    Dataset of (node, root) rows for maps that exceed driver memory — the
    bucketized-join path (VERDICT r2 #7); both produce identical nodes."""
    if not isinstance(alias_map, dict):
        return _apply_alias_merge_join(nodes_ds, alias_map)
    if not alias_map:
        return nodes_ds
    import pyarrow.compute as pc

    from .graph import rewrite_ids, sorted_id_map

    affected = pa.array(sorted(set(alias_map) | set(alias_map.values())),
                        pa.int64())
    am_keys, am_roots = sorted_id_map(alias_map)

    def rewrite(b: pa.Table) -> pa.Table:
        col = b.column("node_id")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        out = rewrite_ids(col.to_numpy(), am_keys, am_roots)
        return b.set_column(b.schema.get_field_index("node_id"), "node_id",
                            pa.array(out, pa.int64()))

    def split(b: pa.Table, keep_affected: bool) -> pa.Table:
        # vectorized membership — the majority-untouched corpus never runs
        # per-row Python here
        mask = pc.is_in(b.column("node_id"), value_set=affected)
        return b.filter(mask if keep_affected else pc.invert(mask))

    from .shuffle import bucketed_group_apply

    untouched = nodes_ds.map_batches(lambda b: split(b, False),
                                     batch_format="pyarrow")
    merged = bucketed_group_apply(
        nodes_ds.map_batches(lambda b: split(b, True), batch_format="pyarrow")
                .map_batches(rewrite, batch_format="pyarrow"),
        ["node_id"], _remerge_nodes, num_buckets=8)
    # normalize the (small) merged side to ARROW blocks: the grouped apply
    # emits pandas blocks, and a union mixing block types crashes any
    # downstream repartition/sort in the shuffle reduce (Ray 2.49's
    # delegating builder asserts one type per output) — latent until a
    # corpus actually produced alias merges
    merged = merged.map_batches(lambda t: t, batch_format="pyarrow")
    return untouched.union(merged)


def _apply_alias_merge_join(nodes_ds, alias_ds, num_buckets: int = 32):
    """Dataset-native alias application: the (node, root) map never touches
    the driver. One bucketized hash-join co-locates each node row with its
    map entry (probe side) and with any map entries POINTING at it (root
    markers — such rows must enter the regroup even though their own id is
    unmapped); rewritten affected rows then re-merge through the same
    ``_remerge_nodes`` the broadcast path uses."""
    from .shuffle import bucketed_group_apply

    def map_rows(b: pa.Table) -> pa.Table:
        """(node, root) → build rows keyed by node (kind 1) + root markers
        keyed by root (kind 2), with empty node payload columns."""
        nodes = b.column("node").to_pylist()
        roots = b.column("root").to_pylist()
        n = len(nodes)
        empty_s = pa.array([""] * (2 * n), pa.string())
        return pa.table({
            "node_id": pa.array(nodes + roots, pa.int64()),
            "canonical": empty_s, "label": empty_s,
            "aliases": pa.array([[]] * (2 * n), pa.list_(pa.string())),
            "mention_count": pa.array([0] * (2 * n), pa.int64()),
            "___root": pa.array(roots + [0] * n, pa.int64()),
            "___kind": pa.array([1] * n + [2] * n, pa.int32())})

    def node_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return b.append_column("___root", pa.array([0] * n, pa.int64()))                 .append_column("___kind", pa.array([0] * n, pa.int32()))

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        from .graph import rewrite_ids, sorted_id_map

        lab = df["___kind"] == 1
        keys, rts = sorted_id_map((df.loc[lab, "node_id"].to_numpy(),
                                   df.loc[lab, "___root"].to_numpy()))
        roots = set(df.loc[df["___kind"] == 2, "node_id"])
        out = df[df["___kind"] == 0].copy(deep=False)
        ids = out["node_id"]
        aff = ids.isin(set(keys.tolist())) | ids.isin(roots)
        out["node_id"] = rewrite_ids(ids.to_numpy(), keys, rts)
        # arrow list columns surface as numpy arrays per element after the
        # pandas round-trip; normalize to plain lists so the block converts
        # back to Arrow cleanly downstream
        out["aliases"] = [list(a) for a in out["aliases"]]
        out["___aff"] = aff.astype("int32")
        return out.drop(columns=["___root", "___kind"])

    def take_aff(df: pd.DataFrame, want: int) -> pd.DataFrame:
        return df[df["___aff"] == want].drop(columns=["___aff"])

    tagged = nodes_ds.map_batches(node_rows, batch_format="pyarrow") \
        .union(alias_ds.map_batches(map_rows, batch_format="pyarrow"))
    joined = bucketed_group_apply(tagged, ["node_id"], join_bucket,
                                  num_buckets=num_buckets).materialize()

    untouched = joined.map_batches(lambda df: take_aff(df, 0),
                                   batch_format="pandas")
    merged = bucketed_group_apply(
        joined.map_batches(lambda df: take_aff(df, 1), batch_format="pandas"),
        ["node_id"], _remerge_nodes, num_buckets=8)
    return untouched.union(merged)
