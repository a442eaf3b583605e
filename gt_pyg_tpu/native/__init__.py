"""ctypes bindings for the native C++ batch packer.

``pack_batch_native`` mirrors :func:`gt_pyg_tpu.data.graph.pad_graph_batch`
semantics (disjoint union, counting sort by destination, trash-slot
padding) in one C++ pass. Built by ``make -C native``; everything degrades
to the numpy path when the shared library is absent.
"""

from __future__ import annotations

import ctypes
import logging
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

_LIB_PATH = Path(__file__).parent / "libgtpacker.so"
_SRC_PATH = Path(__file__).parents[2] / "native" / "packer.cpp"
_lib = None
_build_attempted = False


def _try_build() -> bool:
    """Compile the packer on first use (portable flags, no -march=native:
    the binary is NOT committed to the repo — ADVICE r1)."""
    global _build_attempted
    if _build_attempted:
        return _LIB_PATH.exists()
    _build_attempted = True
    if not _SRC_PATH.exists():
        return False
    import shutil
    import subprocess

    cxx = shutil.which("g++") or shutil.which("c++")
    if cxx is None:
        return False
    try:
        subprocess.run(
            [cxx, "-O3", "-fPIC", "-std=c++17", "-shared",
             "-o", str(_LIB_PATH), str(_SRC_PATH)],
            check=True, capture_output=True, timeout=120)
        logger.info("built native packer at %s", _LIB_PATH)
        return True
    except (subprocess.SubprocessError, OSError) as e:
        logger.warning("native packer build failed (%s); "
                       "using the numpy path", e)
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and not _try_build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError as e:  # pragma: no cover
        logger.warning("failed to load %s: %s", _LIB_PATH, e)
        return None
    i32 = ctypes.c_int32
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.pack_batch.restype = ctypes.c_int
    lib.pack_batch.argtypes = [
        i32, i32, i32, i32,
        i32p, i32p,
        f32p, i64p, i64p, f32p,
        f32p, f32p,
        i32, i32, i32,
        f32p, f32p, i32p, i32p, i32p,
        f32p, f32p, f32p, f32p, f32p,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ip(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _lp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def pack_batch_native(graphs: Sequence, Np: int, Ep: int, Bp: int,
                      num_tasks: int):
    """Pack a list of GraphData via the C++ packer. Returns the GraphBatch
    field dict, or None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None

    B = len(graphs)
    F = graphs[0].x.shape[1]
    D = graphs[0].edge_attr.shape[1]
    has_labels = graphs[0].y is not None
    T = graphs[0].y.shape[1] if has_labels else num_tasks

    n_nodes = np.array([g.num_nodes for g in graphs], np.int32)
    n_edges = np.array([g.num_edges for g in graphs], np.int32)
    xs = np.ascontiguousarray(np.concatenate([g.x for g in graphs]),
                              np.float32)
    if int(n_edges.sum()):
        srcs = np.ascontiguousarray(
            np.concatenate([g.edge_index[0] for g in graphs]), np.int64)
        dsts = np.ascontiguousarray(
            np.concatenate([g.edge_index[1] for g in graphs]), np.int64)
        eattrs = np.ascontiguousarray(
            np.concatenate([g.edge_attr for g in graphs]), np.float32)
    else:
        srcs = np.zeros(0, np.int64)
        dsts = np.zeros(0, np.int64)
        eattrs = np.zeros((0, D), np.float32)

    if has_labels:
        y_in = np.ascontiguousarray(
            np.concatenate([g.y for g in graphs]), np.float32)
        ym_in = np.ascontiguousarray(
            np.concatenate([g.y_mask for g in graphs]), np.float32)
    else:
        y_in = np.zeros((B, T), np.float32)
        ym_in = np.zeros((B, T), np.float32)

    node_x = np.empty((Np, F), np.float32)
    edge_attr = np.empty((Ep, D), np.float32)
    edge_src = np.empty((Ep,), np.int32)
    edge_dst = np.empty((Ep,), np.int32)
    node_graph = np.empty((Np,), np.int32)
    node_mask = np.empty((Np,), np.float32)
    edge_mask = np.empty((Ep,), np.float32)
    graph_mask = np.empty((Bp,), np.float32)
    y_out = np.zeros((Bp, T), np.float32)
    ym_out = np.zeros((Bp, T), np.float32)

    rc = lib.pack_batch(
        B, F, D, T,
        _ip(n_nodes), _ip(n_edges),
        _fp(xs), _lp(srcs), _lp(dsts), _fp(eattrs),
        _fp(y_in), _fp(ym_in),
        Np, Ep, Bp,
        _fp(node_x), _fp(edge_attr), _ip(edge_src), _ip(edge_dst),
        _ip(node_graph), _fp(node_mask), _fp(edge_mask), _fp(graph_mask),
        _fp(y_out), _fp(ym_out))
    if rc != 0:
        reasons = {-1: "padding smaller than totals",
                   -2: "negative per-graph count",
                   -3: "edge index out of range for its graph"}
        raise ValueError(
            f"pack_batch_native failed with code {rc}: "
            f"{reasons.get(rc, 'unknown error')}")

    edge_perm_src = np.argsort(edge_src, kind="stable").astype(np.int32)
    return dict(node_x=node_x, edge_attr=edge_attr, edge_src=edge_src,
                edge_dst=edge_dst, node_graph=node_graph,
                edge_perm_src=edge_perm_src,
                node_mask=node_mask, edge_mask=edge_mask,
                graph_mask=graph_mask, y=y_out, y_mask=ym_out,
                num_nodes=np.int32(int(n_nodes.sum())),
                num_edges=np.int32(int(n_edges.sum())),
                num_graphs=np.int32(B))
