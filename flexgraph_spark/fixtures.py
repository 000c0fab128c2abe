"""Deterministic synthetic inputs (FIXTURES.md F1-F3).

The engine's external input is an Iceberg-style table of source-code
repositories ``(repo, path, commit, lang, content)`` (BASELINE.json
input_hint). The generator first samples an edge list over file keys, then
writes matching import/include lines into ``content`` — so link extraction
is tested against ground truth, not implementation output.

Everything is seed-deterministic (seed=42 conventions) and driver-side
only for the tiny test scales; the bench scale generates the edge list with
NumPy and parallelizes the content rendering through Spark.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np

LANGS = ("py", "c", "java")
EXT = {"py": "py", "c": "h", "java": "java"}


def _module(repo: str, path: str) -> str:
    """Canonical dotted module string for a (repo, path) key.

    ``repo0001 src/mod002/file003.py`` -> ``repo0001.mod002.file003``.
    """
    parts = path.split("/")
    stem = parts[-1].rsplit(".", 1)[0]
    return ".".join([repo, *parts[1:-1], stem])


def _import_line(lang: str, module: str) -> str:
    if lang == "py":
        return f"from {module} import x"
    if lang == "c":
        return '#include "' + module.replace(".", "/") + '.h"'
    return f"import {module};"


@dataclass(frozen=True)
class FileKey:
    repo: str
    path: str
    lang: str

    @property
    def module(self) -> str:
        return _module(self.repo, self.path)


def make_file_keys(n_repos: int, files_per_repo: int) -> list[FileKey]:
    """Deterministic file-key universe: repo{i:04d}/src/mod{j:03d}/file{k:03d}.ext."""
    keys: list[FileKey] = []
    files_per_mod = 10
    for i in range(n_repos):
        repo = f"repo{i:04d}"
        for f in range(files_per_repo):
            j, k = divmod(f, files_per_mod)
            lang = LANGS[(j + k) % 3]
            path = f"src/mod{j:03d}/file{k:03d}.{EXT[lang]}"
            keys.append(FileKey(repo, path, lang))
    return keys


def repo_files_rows(
    n_repos: int = 4,
    files_per_repo: int = 250,
    avg_out_degree: float = 8.0,
    seed: int = 42,
    hub_fraction: float = 0.005,
    hub_boost: int = 60,
) -> tuple[list[dict], list[tuple[int, int]]]:
    """Generate (rows, expected_edges) for the F1 table.

    ``expected_edges`` is by *file index* in the generated key order — the
    same order ``assign_ids`` with strategy='rank' reproduces (sorted by
    (repo, path)), because keys are generated in sorted order.

    A small fraction of files are "hubs" (think stdlib headers) that receive
    ``hub_boost``x extra in-links — realistic skew for the dense/sparse path.
    """
    keys = make_file_keys(n_repos, files_per_repo)
    n = len(keys)
    rng = np.random.default_rng(seed)
    n_hubs = max(1, int(n * hub_fraction))
    hubs = rng.choice(n, size=n_hubs, replace=False)

    # Target-sampling weights: hubs are hub_boost x more likely to be imported.
    w = np.ones(n)
    w[hubs] = hub_boost
    w /= w.sum()

    out_deg = rng.poisson(avg_out_degree, size=n)
    edges: set[tuple[int, int]] = set()
    for src in range(n):
        if out_deg[src] == 0:
            continue
        dsts = rng.choice(n, size=out_deg[src], replace=False, p=w)
        for dst in dsts:
            if dst != src:
                edges.add((src, int(dst)))
    edge_list = sorted(edges)

    imports_by_src: dict[int, list[int]] = {}
    for s, d in edge_list:
        imports_by_src.setdefault(s, []).append(d)

    rows = []
    for idx, key in enumerate(keys):
        lines = [f"// {key.repo}/{key.path}" if key.lang != "py" else f"# {key.repo}/{key.path}"]
        for dst in imports_by_src.get(idx, []):
            lines.append(_import_line(key.lang, keys[dst].module))
        lines.append(f"# body {key.repo}/{key.path}")
        content = "\n".join(lines)
        rows.append(
            {
                "repo": key.repo,
                "path": key.path,
                "commit": hashlib.sha256(f"{key.repo}/{key.path}".encode()).hexdigest()[:40],
                "lang": key.lang,
                "content": content,
            }
        )
    return rows, edge_list


def repo_files_df(spark, **kw):
    """Spark DataFrame version of repo_files_rows (returns df, expected_edges)."""
    from pyspark.sql import types as T

    rows, edges = repo_files_rows(**kw)
    schema = T.StructType(
        [
            T.StructField("repo", T.StringType(), False),
            T.StructField("path", T.StringType(), False),
            T.StructField("commit", T.StringType(), False),
            T.StructField("lang", T.StringType(), False),
            T.StructField("content", T.StringType(), False),
        ]
    )
    return spark.createDataFrame(rows, schema), edges


# ---------------------------------------------------------------------------
# F3 graph topologies — plain (src, dst[, weight]) python lists.
# ---------------------------------------------------------------------------

def topology(name: str, seed: int = 42) -> list[tuple]:
    """Named edge-list fixtures from FIXTURES.md F3."""
    if name == "line10":
        return [(i, i + 1) for i in range(9)]
    if name == "cycle8":
        return [(i, (i + 1) % 8) for i in range(8)]
    if name == "star_hub":
        return [(i, 0) for i in range(1, 200)] + [(0, i) for i in range(1, 200)]
    if name == "two_components":
        k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
        path = [(10 + i, 11 + i) for i in range(4)]
        return k4 + path
    if name == "dangling":
        return [(0, 1), (1, 2)]
    if name == "weighted_diamond":
        return [(0, 1, 1.0), (0, 2, 4.0), (1, 3, 1.0), (2, 3, 1.0)]
    if name == "triangle_mix":
        k3 = [(0, 1), (0, 2), (1, 2)]
        k4 = [(10 + a, 10 + b) for a in range(4) for b in range(a + 1, 4)]
        c4 = [(20, 21), (21, 22), (22, 23), (23, 20)]
        return k3 + k4 + c4
    if name == "lp_blocks":
        rng = np.random.default_rng(seed)
        edges = []
        for base in (0, 20):
            for a in range(20):
                for b in range(a + 1, 20):
                    if rng.random() < 0.8:
                        edges.append((base + a, base + b))
        edges.append((0, 20))  # bridge
        return edges
    raise KeyError(name)


def rand_er(n: int, p: float, seed: int = 42) -> list[tuple[int, int]]:
    rng = np.random.default_rng(seed)
    mask = rng.random((n, n)) < p
    np.fill_diagonal(mask, False)
    src, dst = np.nonzero(mask)
    return list(zip(src.tolist(), dst.tolist()))


def powerlaw(n: int, m: int = 3, seed: int = 42) -> list[tuple[int, int]]:
    """Barabási–Albert-style preferential attachment (directed new -> old)."""
    rng = np.random.default_rng(seed)
    targets = list(range(m))
    repeated: list[int] = list(range(m))
    edges: list[tuple[int, int]] = []
    for v in range(m, n):
        picks = rng.choice(repeated, size=m, replace=False) if len(repeated) >= m else targets
        picked = set(int(x) for x in np.atleast_1d(picks))
        for t in picked:
            edges.append((v, t))
            repeated.append(t)
        repeated.extend([v] * len(picked))
    return edges


def edges_df(spark, edges: list[tuple], weighted: bool = False):
    """Edge list -> Spark DataFrame (src long, dst long[, weight double])."""
    from pyspark.sql import types as T

    fields = [
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
    ]
    if weighted:
        fields.append(T.StructField("weight", T.DoubleType(), False))
        rows = [(int(e[0]), int(e[1]), float(e[2]) if len(e) > 2 else 1.0) for e in edges]
    else:
        rows = [(int(e[0]), int(e[1])) for e in edges]
    return spark.createDataFrame(rows, T.StructType(fields))
