"""Multi-chip all-vs-all comparison: presence-matmul scoring on the MXU.

Scoring model: let G be the number of distinct (minimizer, k-mer) pairs
observed across all N sketches and Pm the (G, N) 0/1 presence matrix.
Then S = Pm^T Pm has S[i,j] = |pairs shared by files i and j| (the
reference's score_A, Comparator.cpp:269-287) and S[i,i] =
nb_kmer_seen_infile[i]. This turns the comparison into batched matmuls:
pair-rows are tiled into chunks, chunks are sharded across the mesh
'data' axis, each device accumulates its partial S on the MXU, and one
psum over ICI merges the N x N partials.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from supersampler_tpu.compare.reader import decode_sketch_pairs


def build_presence_chunks(files: List[str], query_size: int = None):
    """Decode sketches and build group/file presence coordinates.

    Returns (group_ids int32[], file_ids int32[], n_groups, per-file
    pair counts, k, m). Groups = distinct (minimizer, kmer) pairs
    (query-mode bucket filtering applied to scoring groups only).
    """
    n = len(files)
    if query_size is None:
        query_size = n
    mins_l, his_l, los_l, fids_l = [], [], [], []
    nb_seen = [0] * n
    query_minimizers = set()
    k = m = 0
    for f, path in enumerate(files):
        mins, his, los, k, m, bucket_mins = decode_sketch_pairs(path)
        nb_seen[f] = int(mins.size)
        mins_l.append(mins)
        his_l.append(his)
        los_l.append(los)
        fids_l.append(np.full(mins.size, f, dtype=np.int32))
        if f < query_size:
            query_minimizers |= bucket_mins
    mins = np.concatenate(mins_l)
    his = np.concatenate(his_l)
    los = np.concatenate(los_l)
    fids = np.concatenate(fids_l)
    if query_size < n:
        qm = np.array(sorted(query_minimizers), dtype=np.uint64)
        keep = np.isin(mins, qm)
        mins, his, los, fids = mins[keep], his[keep], los[keep], fids[keep]
    order = np.lexsort((fids, los, his, mins))
    mins, his, los, fids = mins[order], his[order], los[order], fids[order]
    new_group = np.ones(mins.size, dtype=bool)
    if mins.size:
        new_group[1:] = ((mins[1:] != mins[:-1]) | (his[1:] != his[:-1])
                         | (los[1:] != los[:-1]))
    gids = (np.cumsum(new_group) - 1).astype(np.int32)
    n_groups = int(gids[-1]) + 1 if gids.size else 0
    return gids, fids.astype(np.int32), n_groups, nb_seen, k, m


def score_matrix_device(gids: np.ndarray, fids: np.ndarray, n_groups: int,
                        n_files: int, mesh: Mesh = None,
                        chunk_groups: int = 4096,
                        axis_name: str = "data") -> np.ndarray:
    """Accumulate S = Pm^T Pm over group-chunks on device.

    Presence chunks are built host-side as dense (chunk_groups, N)
    float32 blocks (counts fit f32 exactly below 2^24 per chunk row;
    the final sum is integer-exact since each partial is integral).
    With a mesh, chunk rows are sharded over 'data' and partial scores
    merged with a psum over ICI.
    """
    if n_groups == 0 or fids.size == 0:
        return np.zeros((n_files, n_files), dtype=np.int64)
    n_dev = 1 if mesh is None else mesh.devices.size

    # Pad groups so every device gets the same number of chunks.
    rows_per_chunk = chunk_groups
    n_chunks = -(-n_groups // rows_per_chunk)
    n_chunks = -(-n_chunks // n_dev) * n_dev
    total_rows = n_chunks * rows_per_chunk

    # scatter presence into dense chunks on host; int8 feeds the MXU's
    # s8xs8->s32 path and keeps counts integer-exact
    pres = np.zeros((total_rows, n_files), dtype=np.int8)
    pres[gids, fids] = 1
    chunks = pres.reshape(n_chunks, rows_per_chunk, n_files)

    @functools.partial(jax.jit)
    def accumulate(blocks):  # (C, R, N) int8
        flat = blocks.reshape(-1, blocks.shape[-1])
        return jnp.dot(flat.T, flat, preferred_element_type=jnp.int32)

    if mesh is None or n_dev == 1:
        score = np.asarray(accumulate(jnp.asarray(chunks)))
    else:
        from jax import shard_map

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=P(axis_name), out_specs=P())
        def sharded(blocks):
            local = accumulate(blocks)
            return jax.lax.psum(local, axis_name)

        score = np.asarray(jax.jit(sharded)(jnp.asarray(chunks)))
    return score.astype(np.int64)


def scores_to_dict(score: np.ndarray, query_size: int) -> Dict[int, int]:
    """Upper-triangular score matrix -> the reference's score_A map."""
    n = score.shape[0]
    out: Dict[int, int] = {}
    for i in range(n):
        for j in range(i + 1, n):
            v = int(score[i, j])
            if v > 0:
                out[i * n + j] = v
    return out
