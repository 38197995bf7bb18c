"""Synthetic benchmark graphs (Reddit-dimension stand-in).

The real Reddit npz (FastGCN export, reference README.md:66-68) is not
bundled; this generator builds a graph with Reddit's exact node / edge /
feature / class / train-row counts and a squared-uniform degree skew so
benchmark work matches the real shape (bench.py, cli/pallas_bench.py).
NOT the real power-law tail — results on it are labeled synthetic.
"""

from __future__ import annotations

import numpy as np

REDDIT_NODES = 232_965
REDDIT_EDGES = 11_606_919
REDDIT_FEATURES = 602
REDDIT_CLASSES = 41
REDDIT_TRAIN = 152_410


def synthetic_reddit(scale: float, seed: int = 42):
    """Build (graph, features, labels, idx_train) at ``scale`` of Reddit.

    Returns the aug-normalized :class:`SparseGraph` plus f32 features,
    int32 labels, and the train row ids (first ``REDDIT_TRAIN * scale``).
    """
    import scipy.sparse as sp

    from sgc_tpu.graph.normalize import aug_normalized_adjacency
    from sgc_tpu.graph.sparse import SparseGraph

    n = max(int(REDDIT_NODES * scale), 1024)
    e = max(int(REDDIT_EDGES * scale), 4096)
    rng = np.random.default_rng(seed)

    src = (rng.random(e // 2) ** 2 * n).astype(np.int64) % n
    dst = rng.integers(0, n, e // 2)
    adj = sp.coo_matrix(
        (np.ones(e // 2, dtype=np.float32), (src, dst)), shape=(n, n)
    )
    adj = adj + adj.T
    graph = SparseGraph.from_scipy(aug_normalized_adjacency(adj))

    features = rng.normal(size=(n, REDDIT_FEATURES)).astype(np.float32)
    labels = rng.integers(0, REDDIT_CLASSES, n).astype(np.int32)
    n_train = min(max(int(REDDIT_TRAIN * scale), 256), n)
    return graph, features, labels, np.arange(n_train)


def synthetic_reddit_clustered(
    scale: float,
    seed: int = 42,
    communities: int = 50,
    intra: float = 0.85,
    shuffle: bool = False,
    device: bool = True,
    tail: str = "sq",
):
    """Reddit-dimension synthetic with community structure.

    Real Reddit (post-to-post via shared commenters; reference
    README.md:66-68) is strongly community-clustered — posts in the same
    subreddit are densely interlinked, unlike :func:`synthetic_reddit`'s
    uniform column spread. This variant draws ``intra`` of the edges
    within equal-size communities (contiguous id ranges: stands in for
    the community ordering a clustering / partition pass would produce —
    see graph/reorder.py, parallel/partition.py) and the rest uniformly.

    Under a (row_block, stripe) cell tiling the intra edges concentrate
    in diagonal-block cells, which is the regime where the MXU SpMM
    kernel (ops/spmm_pallas.py) beats the XLA gather path at full scale;
    the inter-community tail stays uniformly sparse. Same return
    contract as :func:`synthetic_reddit`.

    Labels are PLANTED (VERDICT round-4 #3): community id mapped onto
    the 41 classes plus 10% uniform noise, with a class-mean component
    added to the features — real Reddit's regime, where the 41 classes
    ARE the subreddit communities. A trained head is therefore
    measurably above chance (bench.py's ``train_parity`` block gates
    newton-vs-LBFGS on accuracy parity well above chance instead of
    comparing two chance-level fits; reference reddit.py:51-64).
    """
    import scipy.sparse as sp

    from sgc_tpu.graph.normalize import aug_normalized_adjacency
    from sgc_tpu.graph.sparse import SparseGraph

    n = max(int(REDDIT_NODES * scale), 1024)
    e = max(int(REDDIT_EDGES * scale), 4096)
    rng = np.random.default_rng(seed)

    m = e // 2
    comm_size = max(n // communities, 1)
    is_intra = rng.random(m) < intra
    n_in = int(is_intra.sum())

    # intra edges: hub skew WITHIN the community. Default "sq" is the
    # squared-uniform skew; "powerlaw" draws hub ranks from a clipped
    # zipf(1.5) — a much heavier tail (top node holds ~38% of intra
    # endpoints) for topology-sensitivity stress tests
    # (scripts/exp_topology_sweep.py, VERDICT round-2 #4).
    comm = rng.integers(0, communities, n_in)
    base = comm * comm_size
    if tail == "powerlaw":
        hub = np.minimum(rng.zipf(1.5, n_in) - 1, comm_size - 1)
        src_in = base + hub
    else:
        src_in = base + ((rng.random(n_in) ** 2 * comm_size)
                         .astype(np.int64) % comm_size)
    dst_in = base + rng.integers(0, comm_size, n_in)
    # inter edges: uniform pairs (the sparse remainder)
    src_out = rng.integers(0, n, m - n_in)
    dst_out = rng.integers(0, n, m - n_in)

    src = np.clip(np.concatenate([src_in, src_out]), 0, n - 1)
    dst = np.clip(np.concatenate([dst_in, dst_out]), 0, n - 1)

    features = rng.normal(size=(n, REDDIT_FEATURES)).astype(np.float32)
    # planted, learnable labels: label = community % 41 with 10% noise,
    # plus a class-mean feature offset. Propagation in this topology
    # AVERAGES within communities (85% intra edges), so S^2 X carries
    # the class signal to the head — the same mechanism that makes real
    # Reddit 95 micro-F1 under SGC. Drawn from a SEPARATE stream: extra
    # draws on the main rng would shift the shuffle permutation below,
    # changing the LPA recovery tie-breaks and with them the admitted
    # dense fraction (measured 0.851 -> 0.704 — a 15pp headline
    # regression from nothing but relabeling) and breaking cross-round
    # comparability of every timing.
    rng_y = np.random.default_rng(seed + 1_000_003)
    # keep the main stream's draw COUNT identical to the pre-planting
    # generator (labels used to be one rng.integers draw here): the
    # shuffle perm below must reproduce rounds 1-4 exactly, or every
    # cross-round timing comparison silently changes graph layout
    _ = rng.integers(0, REDDIT_CLASSES, n)
    comm_of = np.minimum(np.arange(n) // comm_size, communities - 1)
    labels = (comm_of % REDDIT_CLASSES).astype(np.int32)
    flip = rng_y.random(n) < 0.1
    labels[flip] = rng_y.integers(
        0, REDDIT_CLASSES, int(flip.sum())).astype(np.int32)
    class_means = (0.3 * rng_y.normal(
        size=(REDDIT_CLASSES, REDDIT_FEATURES))).astype(np.float32)
    features += class_means[labels]
    n_train = min(max(int(REDDIT_TRAIN * scale), 256), n)
    idx_train = np.arange(n_train)

    if shuffle:
        # Real graphs arrive with arbitrary node ids — shuffling forces
        # consumers to DISCOVER the community structure (graph/reorder.py
        # lpa_order) instead of inheriting the generator's ordering.
        perm = rng.permutation(n)  # perm[old] = new id
        src, dst = perm[src], perm[dst]
        # per-node arrays must satisfy new_arr[perm[old]] = old_arr[old]
        inv = np.empty(n, np.int64)
        inv[perm] = np.arange(n)
        features = features[inv]
        labels = labels[inv]
        idx_train = np.sort(perm[idx_train])

    adj = sp.coo_matrix(
        (np.ones(m, dtype=np.float32), (src, dst)), shape=(n, n)
    )
    adj = adj + adj.T
    # device=False keeps the graph host-resident — the locality pipeline
    # (LocalityPlan.build) consumes it host-side anyway
    graph = SparseGraph.from_scipy(aug_normalized_adjacency(adj),
                                   device=device)
    return graph, features, labels, idx_train
