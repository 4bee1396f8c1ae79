"""Deterministic synthetic source-code corpus (the authoritative input shape).

Generates the Parquet table ``(repo, path, commit, lang, content)`` described by
``BASELINE.json`` ``input_hint`` / FIXTURES.md §F1, fully determined by
``(row_index, seed)`` — independent of batch boundaries, partitioning and
parallelism, so every run (and every scale-out) produces bit-identical rows.

Skew is intentional and mirrors the reference's RMAT benchmark skew
(a=0.57 hub bias, ``benchmarks/python_e2e/cugraph_dask_funcs.py:54-65``):
repos are drawn Zipf(s=1.1) so a few repos own many files, and import targets
are drawn Zipf over a per-language module universe so a few modules are
super-popular (the dst-hotspot case the salted shuffle handles).

Generation itself is a Ray Data pipeline: ``ray.data.range(n)`` →
``map_batches`` (stateless, vectorized where possible), so corpus synthesis
scales with the cluster like any other stage.
"""

from __future__ import annotations

import functools
import hashlib

import numpy as np
import pyarrow as pa

from raygraph.hashing import splitmix64

LANGS = ("py", "js", "go")
EXT = {"py": "py", "js": "js", "go": "go"}


@functools.lru_cache(maxsize=32)
def _zipf_cdf(n: int, s: float) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    pmf = ranks ** (-s)
    pmf /= pmf.sum()
    return np.cumsum(pmf)


def _u01(x: np.ndarray) -> np.ndarray:
    """uint64 hash values → uniform [0,1) float64."""
    return (x >> np.uint64(11)).astype(np.float64) * (1.0 / (1 << 53))


def _zipf_pick(u: np.ndarray, n: int, s: float) -> np.ndarray:
    """Inverse-CDF Zipf sample (0-based rank) from uniforms."""
    cdf = _zipf_cdf(n, s)
    return np.searchsorted(cdf, u, side="right").clip(0, n - 1)


def num_repos(total_rows: int) -> int:
    return max(20, total_rows // 50)


def num_modules(total_rows: int) -> int:
    return max(100, total_rows // 100)


def corpus_batch(indices: np.ndarray, total_rows: int, seed: int = 42) -> pa.Table:
    """Rows for a batch of global row indices. Pure function of (i, seed)."""
    idx = np.asarray(indices, dtype=np.int64)
    base = splitmix64(idx.view(np.uint64) ^ np.uint64(seed * 0x9E3779B9))
    h_repo = splitmix64(base ^ np.uint64(1))
    h_path = splitmix64(base ^ np.uint64(2))
    h_cont = splitmix64(base ^ np.uint64(3))

    n_repos = num_repos(total_rows)
    n_mods = num_modules(total_rows)
    repo_rank = _zipf_pick(_u01(h_repo), n_repos, 1.1)
    module_dir = (h_path % np.uint64(37)).astype(np.int64)
    n_imports = (1 + (h_cont % np.uint64(6))).astype(np.int64)
    lang_idx = (h_path % np.uint64(len(LANGS))).astype(np.int64)

    repos, paths, commits, langs, contents = [], [], [], [], []
    for k in range(len(idx)):
        i = int(idx[k])
        repo = f"repo{int(repo_rank[k]):05d}"
        lang = LANGS[lang_idx[k]]
        # global row index in the filename keeps paths unique within a repo
        path = f"src/m{int(module_dir[k])}/f{i}.{EXT[lang]}"
        commit = hashlib.sha1(f"{repo}/{path}".encode()).hexdigest()
        # import targets: Zipf over the per-language module universe,
        # deterministic stream from h_cont
        hh = np.uint64(h_cont[k])
        lines = [_header(lang, repo, path)]
        n_imp = int(n_imports[k])
        us = _u01(splitmix64(hh + np.arange(1, n_imp + 1, dtype=np.uint64)))
        targets = _zipf_pick(us, n_mods, 1.2)
        for t in targets:
            lines.append(_import_line(lang, f"{lang}mod{int(t)}"))
        n_fill = int(hh % np.uint64(4)) + 1
        for f in range(n_fill):
            lines.append(f"x{f} = {f} + {i % 97}" if lang == "py" else f"// filler {f} {i % 97}")
        content = "\n".join(lines) + "\n"
        repos.append(repo)
        paths.append(path)
        commits.append(commit)
        langs.append(lang)
        contents.append(content)

    return pa.table(
        {
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": pa.array(contents, pa.string()),
        }
    )


def _header(lang: str, repo: str, path: str) -> str:
    if lang == "py":
        return f"# file: {repo}/{path}"
    return f"// file: {repo}/{path}"


def _import_line(lang: str, module: str) -> str:
    if lang == "py":
        return f"import {module}"
    if lang == "js":
        return f"import {module} from '{module}';"
    return f'import "{module}"'


def corpus_dataset(total_rows: int, seed: int = 42, parallelism: int = -1):
    """Distributed corpus generation: range(n) → map_batches(corpus_batch)."""
    import ray.data as rd

    ds = rd.range(total_rows, override_num_blocks=parallelism if parallelism > 0 else None)

    def gen(batch: pa.Table) -> pa.Table:
        return corpus_batch(batch.column("id").to_numpy(), total_rows, seed)

    return ds.map_batches(gen, batch_format="pyarrow", batch_size=8192)


def write_corpus(out_dir: str, total_rows: int, seed: int = 42) -> str:
    """Materialize the corpus to a Parquet directory (bench/test fixture)."""
    corpus_dataset(total_rows, seed).write_parquet(out_dir)
    return out_dir
