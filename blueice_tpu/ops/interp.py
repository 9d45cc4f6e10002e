"""Multilinear interpolation kernels — the numeric core of the framework.

Two shapes of the same operation:

* :func:`morph_templates` — interpolate a *template tensor* (mus / PMF grids /
  per-event densities, stacked over the leading anchor-grid axes) at one
  nuisance-parameter point ``zs``. This is the TPU-native re-design of the
  reference's ``GridInterpolator.make_interpolator`` (reference:
  blueice/pdf_morphers.py:57-70), which wrapped scipy's RegularGridInterpolator:
  instead of an interpolator *object* per payload, the anchor axis lives as leading
  array axes of one dense device-resident tensor, and evaluation is a 2^k-corner
  ``dynamic_slice`` gather + lerp contraction that jit/grad/vmap compose over.

* :func:`interp_at_points` — interpolate a gridded scalar field at many query
  points (the per-event PDF lookup of the reference's
  ``HistogramPdfSource.pdf(method='linear')``, reference blueice/source.py:219-240,
  including its clip-to-bin-center-range extrapolation rule).

Both are pure jnp: XLA fuses the gathers and lerps; no dynamic shapes.
"""

import itertools

import numpy as np
import jax.numpy as jnp
from jax import lax

__all__ = ['morph_weights', 'morph_templates', 'interp_at_points',
           'piecewise_lookup', 'morph_templates_np', 'interp_at_points_np']


def morph_weights(anchor_arrays, zs):
    """Per-axis lower corner indices and lerp weights for a query point.

    :param anchor_arrays: list of k sorted 1-d arrays of anchor z values
      (each of length >= 2).
    :param zs: length-k vector of query coordinates (assumed in range; clamped).
    :return: (idx, ts): lists of k scalar int indices and k scalar weights in [0,1].
    """
    idx, ts = [], []
    for d, arr in enumerate(anchor_arrays):
        arr = jnp.asarray(arr)
        z = zs[d]
        i = jnp.clip(jnp.searchsorted(arr, z, side='right') - 1, 0, arr.shape[0] - 2)
        x0 = arr[i]
        x1 = arr[i + 1]
        t = jnp.clip((z - x0) / (x1 - x0), 0.0, 1.0)
        idx.append(i)
        ts.append(t)
    return idx, ts


def morph_templates(tensor, anchor_arrays, zs):
    """Multilinear interpolation of ``tensor`` over its leading anchor-grid axes.

    :param tensor: array of shape (n_1, ..., n_k, *extra) — payload stacked over
      the anchor grid.
    :param anchor_arrays: k sorted 1-d anchor coordinate arrays (len n_i >= 2).
    :param zs: length-k query point.
    :return: array of shape ``extra`` — the morphed payload.

    Reads only the 2^k corner templates (one ``dynamic_slice``), so cost is
    O(2^k * prod(extra)) regardless of grid size. Exact at anchor points:
    the lerp is ``(1-t)*a + t*b`` so t==0 returns a and t==1 returns b bit-exactly.
    """
    tensor = jnp.asarray(tensor)
    k = len(anchor_arrays)
    if k == 0:
        return tensor
    extra_shape = tensor.shape[k:]
    idx, ts = morph_weights(anchor_arrays, zs)
    zero = jnp.zeros((), dtype=jnp.int32)
    starts = tuple(i.astype(jnp.int32) for i in idx) \
        + (zero,) * len(extra_shape)
    corner = lax.dynamic_slice(tensor, starts, (2,) * k + extra_shape)
    for t in ts:
        t = t.astype(corner.dtype)
        corner = (1.0 - t) * corner[0] + t * corner[1]
    return corner


def interp_at_points(values, points, coords):
    """Multilinear interpolation of a gridded field at many query points.

    :param values: array of shape (n_1, ..., n_k): field values on the grid.
    :param points: list of k sorted 1-d coordinate arrays (len n_i).
    :param coords: (m, k) query coordinates. Coordinates outside the grid are
      clipped to its range (constant extrapolation — the reference's
      clip-to-bin-center rule, blueice/source.py:234-240).
    :return: (m,) interpolated values.
    """
    values = jnp.asarray(values)
    k = len(points)
    coords = jnp.asarray(coords)
    if coords.ndim == 1:
        coords = coords[:, None]

    idx, ts = [], []
    for d in range(k):
        p = jnp.asarray(points[d])
        n = p.shape[0]
        if n == 1:
            idx.append(jnp.zeros(coords.shape[0], dtype=jnp.int32))
            ts.append(jnp.zeros(coords.shape[0], dtype=values.dtype))
            continue
        x = jnp.clip(coords[:, d], p[0], p[-1])
        i = jnp.clip(jnp.searchsorted(p, x, side='right') - 1, 0, n - 2)
        t = (x - p[i]) / (p[i + 1] - p[i])
        idx.append(i)
        ts.append(t.astype(values.dtype))

    # Pad single-point axes so i+1 indexing below stays in range
    if any(jnp.asarray(p).shape[0] == 1 for p in points):
        pad = [(0, 1) if jnp.asarray(p).shape[0] == 1 else (0, 0) for p in points]
        values = jnp.pad(values, pad, mode='edge')

    out = jnp.zeros(coords.shape[0], dtype=values.dtype)
    for offsets in itertools.product((0, 1), repeat=k):
        w = jnp.ones(coords.shape[0], dtype=values.dtype)
        gather_idx = []
        for d, o in enumerate(offsets):
            w = w * (ts[d] if o else (1.0 - ts[d]))
            gather_idx.append(idx[d] + o)
        out = out + w * values[tuple(gather_idx)]
    return out


def morph_templates_np(tensor, anchor_arrays, zs):
    """Numpy twin of :func:`morph_templates` — identical multilinear math in
    float64 on the host, used by the reference-parity convenience API (which must
    not depend on the active jax backend/precision)."""
    tensor = np.asarray(tensor)
    k = len(anchor_arrays)
    if k == 0:
        return tensor
    zs = np.asarray(zs, dtype=float).ravel()
    slices = []
    ts = []
    for d, arr in enumerate(anchor_arrays):
        arr = np.asarray(arr, dtype=float)
        i = int(np.clip(np.searchsorted(arr, zs[d], side='right') - 1,
                        0, len(arr) - 2))
        t = np.clip((zs[d] - arr[i]) / (arr[i + 1] - arr[i]), 0.0, 1.0)
        slices.append(slice(i, i + 2))
        ts.append(t)
    corner = tensor[tuple(slices)]
    for t in ts:
        corner = (1.0 - t) * corner[0] + t * corner[1]
    return corner


def interp_at_points_np(values, points, coords):
    """Numpy twin of :func:`interp_at_points` (host path, float64)."""
    values = np.asarray(values)
    coords = np.asarray(coords, dtype=float)
    if coords.ndim == 1:
        coords = coords[:, None]
    k = len(points)
    idx, ts = [], []
    for d in range(k):
        p = np.asarray(points[d], dtype=float)
        n = len(p)
        if n == 1:
            idx.append(np.zeros(coords.shape[0], dtype=int))
            ts.append(np.zeros(coords.shape[0]))
            continue
        x = np.clip(coords[:, d], p[0], p[-1])
        i = np.clip(np.searchsorted(p, x, side='right') - 1, 0, n - 2)
        ts.append((x - p[i]) / (p[i + 1] - p[i]))
        idx.append(i)
    if any(len(np.asarray(p)) == 1 for p in points):
        pad = [(0, 1) if len(np.asarray(p)) == 1 else (0, 0) for p in points]
        values = np.pad(values, pad, mode='edge')
    out = np.zeros(coords.shape[0])
    for offsets in itertools.product((0, 1), repeat=k):
        w = np.ones(coords.shape[0])
        gather_idx = []
        for d, o in enumerate(offsets):
            w = w * (ts[d] if o else (1.0 - ts[d]))
            gather_idx.append(idx[d] + o)
        out += w * values[tuple(gather_idx)]
    return out


def piecewise_lookup(values, edges, coords):
    """Piecewise-constant (bin) lookup of a histogram payload at query points.

    :param values: array (n_1-1, ..., n_k-1) of per-bin values.
    :param edges: list of k sorted 1-d bin-edge arrays (len n_i).
    :param coords: (m, k) query coordinates; out-of-range clips to nearest bin.
    :return: (m,) bin values. Left-edge inclusive; last bin includes right edge
      (numpy.histogramdd convention).
    """
    values = jnp.asarray(values)
    coords = jnp.asarray(coords)
    if coords.ndim == 1:
        coords = coords[:, None]
    gather_idx = []
    for d, e in enumerate(edges):
        e = jnp.asarray(e)
        i = jnp.searchsorted(e, coords[:, d], side='right') - 1
        gather_idx.append(jnp.clip(i, 0, e.shape[0] - 2))
    return values[tuple(gather_idx)]
