"""Graph reordering for partition locality (halo minimization).

The row-block partitioner (`sgc_tpu.parallel.partition`) assigns
contiguous node ranges to devices; its communication volume — the halo
fraction — depends entirely on how well the node numbering clusters
neighborhoods. Real graphs (citation networks, doc-word graphs) arrive
with arbitrary ids. Reordering is the host-side preprocessing that makes
block partitioning behave like a real partitioner:

* :func:`rcm_order` — reverse Cuthill-McKee via scipy: bandwidth
  reduction, the classic choice for SpMM locality.
* :func:`bfs_order` — plain BFS from a min-degree seed per component;
  cheaper, similar clustering quality on mesh-like graphs.
* :func:`degree_order` — descending-degree: groups hubs together so
  power-law hot rows land in few blocks (helps load balance analysis).
* :func:`apply_order` — permutes a scipy adjacency + aligned arrays
  (features, labels, index sets) consistently.

The reference has nothing comparable (single device, no locality
pressure); this is TPU-build capability per SURVEY.md §7 ("partitioning
strategy determines everything").
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def rcm_order(adj: sp.spmatrix) -> np.ndarray:
    """Reverse Cuthill-McKee permutation (new_order[i] = old id)."""
    return np.asarray(
        sp.csgraph.reverse_cuthill_mckee(adj.tocsr(), symmetric_mode=True)
    )


def bfs_order(adj: sp.spmatrix) -> np.ndarray:
    """BFS ordering from a min-degree seed of each connected component.

    Traversal runs in scipy's C ``breadth_first_order`` per component (the
    former per-edge Python loop took tens of seconds at 10M+ edges — the
    exact scale this reordering targets)."""
    csr = adj.tocsr()
    n = csr.shape[0]
    deg = np.diff(csr.indptr)
    visited = np.zeros(n, bool)
    order = np.empty(n, np.int64)
    pos = 0
    # iterate components; seeds in ascending degree
    for seed in np.argsort(deg, kind="stable"):
        if visited[seed]:
            continue
        nodes = sp.csgraph.breadth_first_order(
            csr, int(seed), directed=False, return_predecessors=False
        )
        order[pos:pos + len(nodes)] = nodes
        pos += len(nodes)
        visited[nodes] = True
    return order


def degree_order(adj: sp.spmatrix, descending: bool = True) -> np.ndarray:
    """Order nodes by degree (hubs first by default)."""
    deg = np.diff(adj.tocsr().indptr)
    order = np.argsort(deg, kind="stable")
    return order[::-1].copy() if descending else order


def apply_order(
    adj: sp.spmatrix,
    order: np.ndarray,
    *aligned: np.ndarray,
) -> tuple:
    """Permute adjacency (rows+cols) and any node-aligned arrays.

    ``order[i]`` = old id placed at new position i. Index sets (1-D int
    arrays of node ids, e.g. idx_train) must be remapped with
    :func:`remap_indices` instead — aligned arrays here are per-node data
    (features, labels).
    """
    perm = np.asarray(order)
    padj = adj.tocsr()[perm][:, perm]
    out = [np.asarray(a)[perm] for a in aligned]
    return (padj, *out)


def remap_indices(order: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Map old node ids to their new positions under ``order``."""
    inv = np.empty(len(order), np.int64)
    inv[np.asarray(order)] = np.arange(len(order))
    return inv[np.asarray(indices)]


def spectral_order(adj: sp.spmatrix, tol: float = 1e-4) -> np.ndarray:
    """Fiedler-vector ordering: sort nodes by the second eigenvector of
    the normalized Laplacian. The classic spectral-partitioning relaxation
    — contiguous ranges of the order approximate balanced min-cut parts,
    which is exactly what the row-block partitioner consumes.

    Disconnected graphs are handled per component (on the whole graph the
    second eigenvector is a null-space indicator that carries no
    within-component ordering). Falls back to RCM when the eigensolver
    fails to converge on a component."""
    from scipy.sparse.linalg import eigsh

    csr = adj.tocsr().astype(np.float64)
    n_comp, comp = sp.csgraph.connected_components(csr, directed=False)

    def order_component(nodes: np.ndarray) -> np.ndarray:
        m = len(nodes)
        if m <= 2:
            return nodes
        sub = csr[nodes][:, nodes]
        deg = np.asarray(sub.sum(axis=1)).ravel()
        dinv = np.where(deg > 0, deg**-0.5, 0.0)
        d = sp.diags(dinv)
        lap = sp.eye(m) - d @ sub @ d
        try:
            _, vecs = eigsh(lap, k=2, sigma=0, which="LM", tol=tol)
        except Exception:
            local = rcm_order(sub)
            return nodes[local]
        fiedler = dinv * vecs[:, 1]
        return nodes[np.argsort(fiedler, kind="stable")]

    if n_comp == 1:
        return order_component(np.arange(csr.shape[0]))
    # largest components first so each lands in as few blocks as possible
    parts = [np.where(comp == c)[0] for c in range(n_comp)]
    parts.sort(key=len, reverse=True)
    return np.concatenate([order_component(p) for p in parts])


LPA_MAX_ITER = 20
LPA_MIN_MOVED = 1e-3


def lpa_order(
    adj: sp.spmatrix,
    max_iter: int = LPA_MAX_ITER,
    seed: int = 0,
    min_moved: float = LPA_MIN_MOVED,
    impl: str = "auto",
) -> np.ndarray:
    """Community ordering by label propagation (Raghavan et al. 2007).

    Each node repeatedly adopts the most frequent label among its
    neighbors; on community-structured graphs this converges in a handful
    of sweeps and the final labels ARE the communities. Nodes are then
    laid out community-contiguously (largest community first, ascending
    old id inside), which is exactly what block-local consumers want:
    the hybrid SpMM's dense-cell dispatch (`ops/spmm_hybrid.py`) and the
    row-block partitioner both see intra-community edges land in
    diagonal cells. Measured recovery on the clustered synthetic
    (scripts/exp_cluster_recovery.py): shuffled ids 0.03 → lpa ~oracle
    dense_frac, where bfs/rcm plateau near 0.33.

    Two interchangeable label solvers (both deterministic; both valid
    LPA fixpoints, but NOT bitwise-identical to each other):

    * ``native`` — asynchronous sweeps in C++ (graphprep.cpp), the
      at-scale path (~8s for 23M edges vs ~120s sync-numpy).
    * ``sync`` — vectorized synchronous sweeps in numpy: one
      (row, neighbor-label) count per iteration via sort+unique,
      O(E log E)/sweep; ties break uniformly at random (fresh draw per
      sweep, deterministic under ``seed``). No native library needed.

    ``auto`` picks native when the library is built, else sync. Stops
    when fewer than ``min_moved`` of nodes change label in a sweep.
    """
    from sgc_tpu import native

    csr = adj.tocsr()
    n = csr.shape[0]
    if n == 0:
        return np.arange(0)
    if impl not in ("auto", "native", "sync"):
        raise ValueError(f"unknown lpa impl {impl!r}")
    if impl == "auto":
        impl = "native" if native.available() else "sync"
        if impl == "sync":
            import warnings

            # both solvers are valid LPA fixpoints but not identical, so
            # 'auto' orderings (and any downstream density/bench numbers)
            # differ between machines with and without the C++ library —
            # make that visible. seed only affects the sync solver.
            warnings.warn(
                "lpa_order: native library unavailable, using the "
                "synchronous numpy solver — orderings differ from the "
                "native path (pass impl= explicitly to pin one)",
                stacklevel=2,
            )
    if impl == "native":
        labels, _ = native.lpa_labels(
            csr.indptr, csr.indices, max_iter=max_iter,
            min_moved_frac=min_moved)
    else:
        labels = _lpa_labels_sync(csr, max_iter, seed, min_moved)
    return _canonical_order_from_labels(labels, n)


def _canonical_order_from_labels(labels: np.ndarray, n: int) -> np.ndarray:
    """Community labels -> node order: largest community first,
    ascending old id within (shared by lpa_order and the scipy-free
    fast path in reorder_graph_arrays)."""
    comm_ids, comm_inverse, comm_sizes = np.unique(
        labels, return_inverse=True, return_counts=True)
    rank = np.empty(len(comm_ids), np.int64)
    rank[np.argsort(-comm_sizes, kind="stable")] = np.arange(len(comm_ids))
    return np.lexsort((np.arange(n), rank[comm_inverse]))


def _lpa_labels_sync(csr, max_iter: int, seed: int, min_moved: float):
    """Synchronous vectorized LPA sweeps (the no-native-library path)."""
    n = csr.shape[0]
    indptr = csr.indptr
    indices = csr.indices.astype(np.int64)
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    labels = np.arange(n, dtype=np.int64)
    rng = np.random.default_rng(seed)
    for _ in range(max_iter):
        key = rows * n + labels[indices]
        uniq, counts = np.unique(key, return_counts=True)
        urow = uniq // n
        ulab = uniq % n
        # per-row argmax of counts, uniform random tie-break: sort by
        # (row, count, random) and take the last entry of each row group
        perm = np.lexsort((rng.random(len(uniq)), counts, urow))
        urow_s = urow[perm]
        last = np.nonzero(np.diff(urow_s, append=n + 1))[0]
        new = labels.copy()
        new[urow_s[last]] = ulab[perm][last]
        moved = int((new != labels).sum())
        labels = new
        if moved <= min_moved * n:
            break
    return labels


ORDERINGS = {
    "rcm": rcm_order,
    "bfs": bfs_order,
    "degree": degree_order,
    "spectral": spectral_order,
    "lpa": lpa_order,
    "none": lambda adj: np.arange(adj.shape[0]),
}


def fetch_ordering(name: str):
    if name not in ORDERINGS:
        raise ValueError(f"unknown ordering {name!r}; one of {list(ORDERINGS)}")
    return ORDERINGS[name]


def reorder_graph_arrays(graph, name: str, features, labels, idx):
    """Apply a registered ordering to a graph + node-aligned arrays.

    One shared recipe (coo -> csr -> ordering -> permute -> presorted
    host-resident SparseGraph) for every consumer — LocalityPlan.build
    and parallel/fit.fit_sharded(reorder=) must not drift apart.
    Returns ``(graph_p, features_p, labels_p, idx_p, order)`` with
    ``graph_p`` host-resident (device=False) and ``idx_p`` sorted.
    """
    import scipy.sparse as sp_  # noqa: N813 (module-local alias)

    from sgc_tpu import native
    from sgc_tpu.graph.sparse import SparseGraph

    nnz = graph.nnz
    rows = np.asarray(graph.rows)[:nnz].astype(np.int64)
    cols = np.asarray(graph.cols)[:nnz].astype(np.int64)
    vals = np.asarray(graph.vals)[:nnz].astype(np.float32)

    if name == "lpa" and native.available() and graph.n_rows == graph.n_cols:
        # scipy-free fast path: the coo->csr conversion plus the
        # [perm][:, perm] fancy-index permute allocate several
        # hundred-MB arrays each, which pay the first-touch fault wall
        # (utils/alloc.py) — measured as the dominant 10-30 s of
        # order_s variance at Reddit scale. The graph's own (row,col)-
        # sorted arrays already ARE the CSR: coalesce (tocsr parity:
        # duplicate edges sum), row_ptr, native LPA, then permute the
        # COO directly and rebuild via the native radix sort.
        rows, cols, vals = native.coalesce(rows, cols, vals)
        indptr = native.row_ptr_from_sorted(rows, graph.n_rows)
        # shared constants: this path and lpa_order must stay the same
        # fixpoint (a drifted default would silently change orderings
        # between the two entry points)
        lab, _ = native.lpa_labels(indptr, cols, max_iter=LPA_MAX_ITER,
                                   min_moved_frac=LPA_MIN_MOVED)
        order = _canonical_order_from_labels(lab, graph.n_rows)
        inv = np.empty(graph.n_rows, np.int64)
        inv[order] = np.arange(graph.n_rows)
        graph_p = SparseGraph.from_coo(
            inv[rows], inv[cols], vals, n_rows=graph.n_rows,
            n_cols=graph.n_cols, device=False)
        feats = np.asarray(features)
        if feats.dtype == np.float32 and feats.ndim == 2:
            # the permuted copy is the largest host allocation here
            # (560 MB at Reddit scale) — hugepage-backed (utils/alloc)
            from sgc_tpu.utils.alloc import zeros_hugepage

            features_p = zeros_hugepage(feats.size, np.float32).reshape(
                feats.shape)
            np.take(feats, order, axis=0, out=features_p)
        else:
            features_p = feats[order]
        labels_p = np.asarray(labels)[order]
        idx_p = np.sort(inv[np.asarray(idx)])
        return graph_p, features_p, labels_p, idx_p, order

    adj = sp_.coo_matrix(
        (vals, (rows, cols)),
        shape=(graph.n_rows, graph.n_cols)).tocsr()
    order = fetch_ordering(name)(adj)
    adj_p, features_p, labels_p = apply_order(
        adj, order, np.asarray(features), np.asarray(labels))
    idx_p = np.sort(remap_indices(order, np.asarray(idx)))
    adj_p.sort_indices()  # enables from_scipy's presorted fast path
    graph_p = SparseGraph.from_scipy(adj_p, device=False)
    return graph_p, features_p, labels_p, idx_p, order
