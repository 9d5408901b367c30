"""Distributed connected components (large-star/small-star) vs a plain
union-find reference on planted graphs."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from nrt_ray.stages.concomp import connected_components


def _uf_labels(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in parent}


def _check(edges, nparts):
    tbl = pa.table({"u": pa.array([e[0] for e in edges], pa.int64()),
                    "v": pa.array([e[1] for e in edges], pa.int64())})
    out = connected_components(tbl, nparts=nparts)
    got = dict(zip(out["node"].to_pylist(), out["label"].to_pylist()))
    assert got == _uf_labels(edges)


@pytest.mark.parametrize("nparts", [1, 2, 5])
def test_path_star_and_disjoint_clusters(ray_session, nparts):
    edges = (
        [(i, i + 1) for i in range(100, 120)]          # long path
        + [(500, x) for x in range(501, 511)]          # star
        + [(7, 9), (9, 3), (3, 7)]                     # triangle w/ cycle
        + [(1000, 2000)]                               # pair
    )
    _check(edges, nparts)


def test_random_graph_matches_union_find(ray_session):
    rng = np.random.default_rng(42)
    # 40 clusters of random size, random spanning edges + extra chords
    edges = []
    base = 0
    for _ in range(40):
        size = int(rng.integers(2, 30))
        nodes = base + rng.permutation(size)
        for i in range(1, size):
            edges.append((int(nodes[i - 1]), int(nodes[i])))
        for _ in range(size // 3):
            a, b = rng.choice(nodes, 2, replace=False)
            edges.append((int(a), int(b)))
        base += size + int(rng.integers(1, 5))
    rng.shuffle(edges)
    _check(edges, nparts=4)


def test_empty_and_self_loops(ray_session):
    empty = pa.table({"u": pa.array([], pa.int64()),
                      "v": pa.array([], pa.int64())})
    assert connected_components(empty, nparts=3).num_rows == 0
    loops = pa.table({"u": pa.array([4, 4, 9], pa.int64()),
                      "v": pa.array([4, 5, 9], pa.int64())})
    out = connected_components(loops, nparts=3)
    got = dict(zip(out["node"].to_pylist(), out["label"].to_pylist()))
    # pure self-loop nodes vanish with their loop edge; 9 has no real edge
    assert got == {4: 4, 5: 4}
