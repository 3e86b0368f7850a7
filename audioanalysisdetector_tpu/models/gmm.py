"""Diagonal-covariance GMM-UBM with MAP adaptation — pure JAX.

TPU-native replacement for the reference's sklearn-based GMM subsystem
(reference/ASV_dl_func.py:1132-1203): a 128-component diagonal
``GaussianMixture`` UBM fit by EM on all training CQCC frames, per-class
models derived by MAP adaptation (relevance factor 10), and scoring as the
mean per-frame log-likelihood ratio.

Design: densities are evaluated with the quadratic expansion
``(x - mu)^2 / var = x^2 (1/var) - 2 x (mu/var) + mu^2/var`` so the hot path
is two GEMMs per E-step — exactly what the MXU wants. EM iterations run flat
(responsibilities materialized; ~16 ms/iter for 1.8M frames x 128 comps)
whenever the ``(N, K)`` matrix fits HBM, falling back to chunked
``lax.scan`` accumulation for larger-than-memory fits.

The reference's UBM takes 478.85 s on CPU for ~1.8 M frames
(ASV_deep_learning.ipynb cell 25); this implementation is the bench target
replacing it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

_LOG2PI = float(np.log(2.0 * np.pi))


@struct.dataclass
class DiagGMM:
    """weights (K,), means (K, D), variances (K, D) — a jit-safe pytree."""

    weights: jnp.ndarray
    means: jnp.ndarray
    variances: jnp.ndarray

    @property
    def n_components(self) -> int:
        return self.means.shape[0]


def component_log_prob(x: jnp.ndarray, gmm: DiagGMM) -> jnp.ndarray:
    """Per-component Gaussian log-density: (..., D) -> (..., K)."""
    inv_var = 1.0 / gmm.variances  # (K, D)
    quad = (
        (x * x) @ inv_var.T
        - 2.0 * (x @ (gmm.means * inv_var).T)
        + jnp.sum(gmm.means * gmm.means * inv_var, axis=-1)
    )
    log_det = jnp.sum(jnp.log(gmm.variances), axis=-1)  # (K,)
    d = x.shape[-1]
    return -0.5 * (d * _LOG2PI + log_det + quad)


def log_weighted(x: jnp.ndarray, gmm: DiagGMM) -> jnp.ndarray:
    return component_log_prob(x, gmm) + jnp.log(gmm.weights)


def score_samples(x: jnp.ndarray, gmm: DiagGMM) -> jnp.ndarray:
    """Per-frame log-likelihood: (..., D) -> (...)."""
    return jax.scipy.special.logsumexp(log_weighted(x, gmm), axis=-1)


def score(x: jnp.ndarray, gmm: DiagGMM) -> jnp.ndarray:
    """Mean per-frame log-likelihood (sklearn ``.score`` semantics)."""
    return jnp.mean(score_samples(x, gmm), axis=-1)


def predict_proba(x: jnp.ndarray, gmm: DiagGMM) -> jnp.ndarray:
    return jax.nn.softmax(log_weighted(x, gmm), axis=-1)


def compute_llr(x: jnp.ndarray, gmm1: DiagGMM, gmm2: DiagGMM) -> jnp.ndarray:
    """Mean-LL ratio, the reference's ``compute_llr``
    (reference/ASV_dl_func.py:1200-1203): (..., T, D) -> (...)."""
    return score(x, gmm1) - score(x, gmm2)


def masked_llr(
    x: jnp.ndarray, mask: jnp.ndarray, gmm1: DiagGMM, gmm2: DiagGMM
) -> jnp.ndarray:
    """LLR over valid frames only: x (..., T, D), mask (..., T) boolean.

    Matches the reference scorer's padding semantics
    (reference/ASV_dl_func.py:1486-1489) without any host round-trip.
    """
    diff = score_samples(x, gmm1) - score_samples(x, gmm2)  # (..., T)
    m = mask.astype(diff.dtype)
    denom = jnp.maximum(jnp.sum(m, axis=-1), 1.0)
    return jnp.sum(diff * m, axis=-1) / denom


# ---------------------------------------------------------------- EM fitting


def _estep_stats(x_chunk: jnp.ndarray, w_chunk: jnp.ndarray, gmm: DiagGMM):
    """Weighted sufficient statistics of one chunk. w_chunk masks padding."""
    logr = log_weighted(x_chunk, gmm)
    log_norm = jax.scipy.special.logsumexp(logr, axis=-1, keepdims=True)
    resp = jnp.exp(logr - log_norm) * w_chunk[:, None]
    nk = jnp.sum(resp, axis=0)  # (K,)
    fk = resp.T @ x_chunk  # (K, D)
    sk = resp.T @ (x_chunk * x_chunk)  # (K, D)
    ll = jnp.sum(log_norm[:, 0] * w_chunk)
    return nk, fk, sk, ll


def _pad_to_chunks(x: np.ndarray, chunk: int) -> tuple[np.ndarray, np.ndarray]:
    n = x.shape[0]
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    xp = np.pad(x, ((0, pad), (0, 0)))
    w = np.concatenate([np.ones(n), np.zeros(pad)]).astype(x.dtype)
    return xp.reshape(n_chunks, chunk, -1), w.reshape(n_chunks, chunk)


@partial(jax.jit, static_argnames=("reg_covar",))
def _em_step_flat(x: jnp.ndarray, gmm: DiagGMM, reg_covar: float = 1e-6):
    """One EM iteration with the (N, K) responsibilities materialized.

    For fits whose responsibility matrix fits HBM (N*K*4 bytes; 920 MB for
    the reference's 1.8M-frame/128-component UBM) this flat form measures
    ~16 ms/iter on the target chip vs ~105-148 ms for the chunked
    ``lax.scan`` form — the scan's per-chunk slicing and carry traffic cost
    far more than the resp matrix's HBM footprint saves. ``fit_em`` picks
    this path automatically (see ``flat_bytes``).
    """
    lr = log_weighted(x, gmm)
    ln = jax.scipy.special.logsumexp(lr, axis=-1, keepdims=True)
    resp = jnp.exp(lr - ln)
    nk = jnp.sum(resp, axis=0)
    fk = resp.T @ x
    sk = resp.T @ (x * x)
    n_total = x.shape[0]
    nk_safe = nk + 10.0 * jnp.finfo(x.dtype).eps
    means = fk / nk_safe[:, None]
    variances = sk / nk_safe[:, None] - means * means + reg_covar
    weights = nk / n_total
    return DiagGMM(weights=weights, means=means, variances=variances), (
        jnp.sum(ln) / n_total
    )


@partial(jax.jit, static_argnames=("reg_covar",))
def _em_step(xc: jnp.ndarray, wc: jnp.ndarray, gmm: DiagGMM, reg_covar: float = 1e-6):
    def body(carry, chunk):
        nk, fk, sk, ll = carry
        x_c, w_c = chunk
        dnk, dfk, dsk, dll = _estep_stats(x_c, w_c, gmm)
        return (nk + dnk, fk + dfk, sk + dsk, ll + dll), None

    k, d = gmm.means.shape
    init = (
        jnp.zeros(k, xc.dtype),
        jnp.zeros((k, d), xc.dtype),
        jnp.zeros((k, d), xc.dtype),
        jnp.zeros((), xc.dtype),
    )
    (nk, fk, sk, ll), _ = jax.lax.scan(body, init, (xc, wc))
    n_total = jnp.sum(wc)
    nk_safe = nk + 10.0 * jnp.finfo(xc.dtype).eps
    means = fk / nk_safe[:, None]
    variances = sk / nk_safe[:, None] - means * means + reg_covar
    weights = nk / n_total
    return DiagGMM(weights=weights, means=means, variances=variances), ll / n_total


@partial(jax.jit, static_argnames=("iters",))
def _lloyd(sub: jnp.ndarray, centers: jnp.ndarray, iters: int = 10) -> jnp.ndarray:
    """Lloyd iterations on device — distances and segment means as GEMMs."""

    def body(c, _):
        d2 = (
            jnp.sum(sub * sub, axis=1, keepdims=True)
            - 2.0 * (sub @ c.T)
            + jnp.sum(c * c, axis=1)
        )
        onehot = jax.nn.one_hot(jnp.argmin(d2, axis=1), c.shape[0], dtype=sub.dtype)
        counts = jnp.sum(onehot, axis=0)  # (K,)
        sums = onehot.T @ sub  # (K, D)
        new_c = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts, 1.0)[:, None], c)
        return new_c, None

    out, _ = jax.lax.scan(body, centers, None, length=iters)
    return out


def _kmeans_init(x, k: int, seed: int, iters: int = 10) -> np.ndarray:
    """k-means++ seeding (host, incremental) + Lloyd on device.

    sklearn's GaussianMixture defaults to k-means initialization; a subsample
    suffices to place initial responsibilities. ``x`` may be a host or a
    device array — only the ≤100k-row subsample ever crosses to the host.
    """
    rng = np.random.default_rng(seed)
    idx = rng.choice(x.shape[0], min(x.shape[0], 100_000), replace=False)
    if isinstance(x, jax.Array):
        sub = np.asarray(jnp.take(x, jnp.asarray(idx), axis=0))
    else:
        sub = x[idx]
    seed_pool = sub[: min(len(sub), 20_000)]
    centers = [seed_pool[rng.integers(len(seed_pool))]]
    d2 = np.full(len(seed_pool), np.inf, dtype=np.float32)
    for _ in range(1, k):
        d2 = np.minimum(d2, ((seed_pool - centers[-1]) ** 2).sum(-1))
        probs = d2 / d2.sum()
        centers.append(seed_pool[rng.choice(len(seed_pool), p=probs)])
    centers = jnp.asarray(np.stack(centers))
    return np.asarray(_lloyd(jax.device_put(sub), centers, iters=iters))


@jax.jit
def _floor_variances(gmm: DiagGMM, floor: jnp.ndarray) -> DiagGMM:
    return gmm.replace(variances=jnp.maximum(gmm.variances, floor))


def fit_em(
    x: np.ndarray,
    n_components: int = 128,
    *,
    max_iter: int = 100,
    tol: float = 1e-3,
    reg_covar: float = 1e-6,
    var_floor_rel: float = 0.0,
    seed: int = 42,
    chunk: int = 65536,
    flat_bytes: int = 2 << 30,
    verbose: bool = False,
) -> DiagGMM:
    """Fit a diagonal GMM by EM (sklearn-equivalent semantics, on device).

    ``tol`` is on the change of mean per-frame log-likelihood, like sklearn's
    ``lower_bound_`` convergence test.

    ``var_floor_rel`` > 0 floors each component's per-dim variance at
    ``var_floor_rel * Var(x_dim)`` after every M-step. sklearn's additive
    ``reg_covar`` (1e-6, kept) does NOT stop a component from collapsing onto
    near-duplicate frames; a collapsed component's huge log-densities then
    dominate every downstream LLR (observed on the surrogate corpus: LLR std
    138 and sign inversion in one TPU fit). 0.0 preserves exact sklearn
    semantics; the GMM-UBM system passes 1e-3.

    When the responsibility matrix fits in ``flat_bytes`` of HBM
    (``N * n_components * 4``), iterations run unchunked (``_em_step_flat``,
    ~7x faster end-to-end on the 1.8M-frame benchmark); larger fits fall
    back to the chunked ``lax.scan`` accumulator that never materializes it.

    ``x`` may be a device-resident ``jax.Array`` — then nothing but the
    k-means subsample and per-iteration scalars ever cross the interconnect
    (the training orchestration uploads frames ONCE and reuses the buffer
    for MAP adaptation; see ``train/gmm_system.py``).

    Multi-chip: pass ``x`` sharded over the frame axis
    (``jax.device_put(x, NamedSharding(mesh, P("data")))``) and the EM runs
    data-parallel — the flat step is GEMMs + frame-axis reductions, so
    GSPMD partitions it and inserts the psums; no shard_map needed
    (verified equal to the single-device fit on the 8-device CPU mesh,
    tests/test_sharded_gmm.py). ``map_adapt`` accepts the same sharded
    buffer.
    """
    on_device = isinstance(x, jax.Array)
    if on_device:
        x = x.astype(jnp.float32)
        var_host = np.asarray(jnp.var(x, axis=0))
    else:
        x = np.asarray(x, dtype=np.float32)
        var_host = x.var(axis=0)
    centers = _kmeans_init(x, n_components, seed)
    var0 = np.full((n_components, x.shape[1]), var_host + reg_covar, dtype=np.float32)
    gmm = DiagGMM(
        weights=jnp.full((n_components,), 1.0 / n_components, jnp.float32),
        means=jnp.asarray(centers, jnp.float32),
        variances=jnp.asarray(var0),
    )
    floor = (
        jnp.asarray(var_floor_rel * var_host + reg_covar, jnp.float32)
        if var_floor_rel > 0
        else None
    )
    if x.shape[0] * n_components * 4 <= flat_bytes:
        xd = x if on_device else jax.device_put(x)
        step = lambda g: _em_step_flat(xd, g, reg_covar=reg_covar)
    else:
        if on_device:
            n = x.shape[0]
            n_chunks = -(-n // chunk)
            pad = n_chunks * chunk - n
            xc = jnp.pad(x, ((0, pad), (0, 0))).reshape(n_chunks, chunk, -1)
            wc = jnp.concatenate(
                [jnp.ones(n, x.dtype), jnp.zeros(pad, x.dtype)]
            ).reshape(n_chunks, chunk)
        else:
            xc_np, wc_np = _pad_to_chunks(x, chunk)
            # device_put (not asarray) — materializes the upload eagerly
            xc, wc = jax.device_put(xc_np), jax.device_put(wc_np)
        step = lambda g: _em_step(xc, wc, g, reg_covar=reg_covar)
    if floor is not None:
        base_step = step

        def step(g, _base=base_step, _floor=floor):
            g2, ll = _base(g)
            return _floor_variances(g2, _floor), ll

    if verbose:
        # per-iteration host fetch only when asked to narrate
        prev_ll = -np.inf
        for it in range(max_iter):
            gmm, ll = step(gmm)
            ll = float(ll)
            print(f"EM iter {it}: mean LL {ll:.6f}")
            if tol > 0 and abs(ll - prev_ll) < tol:
                break
            prev_ll = ll
        return gmm
    # Convergence checked in WINDOWS: iterations dispatch back-to-back with
    # per-iteration LLs kept on device; ONE stacked fetch per window replaces
    # the per-iteration float(ll) sync (~69 ms RPC each on tunneled TPUs —
    # round-1 review Weak #6). The window's LL history recovers sklearn's
    # exact stopping state: the model AFTER the first iteration whose
    # |ΔLL| < tol. (Whole-loop designs measured SLOWER on this runtime for
    # the 1.8M-frame/128-component benchmark: lax.while_loop ~8x, blocked
    # scan+cond ~2x, vs ~24 s for this per-iteration-dispatch form.)
    sync_every = 10
    prev_ll = -np.inf
    window_lls: list = []
    window_states: list = []
    for it in range(max_iter):
        gmm, ll = step(gmm)
        window_lls.append(ll)
        window_states.append(gmm)
        if len(window_lls) == sync_every or it == max_iter - 1:
            if tol > 0:
                vals = np.asarray(jax.device_get(jnp.stack(window_lls)))
                deltas = np.abs(np.diff(np.concatenate([[prev_ll], vals])))
                hits = np.nonzero(deltas < tol)[0]
                if hits.size:
                    return window_states[int(hits[0])]
                prev_ll = float(vals[-1])
            window_lls.clear()
            window_states.clear()
    return gmm


@partial(
    jax.jit,
    static_argnames=("relevance_factor", "var_floor", "adapt_vars", "adapt_weights"),
)
def map_adapt(
    ubm: DiagGMM,
    x: jnp.ndarray,
    *,
    relevance_factor: float = 10.0,
    var_floor: float = 1e-6,
    frame_weights: jnp.ndarray | None = None,
    adapt_vars: bool = True,
    adapt_weights: bool = True,
) -> DiagGMM:
    """MAP adaptation with the reference's exact update equations
    (reference/ASV_dl_func.py:1172-1197).

    The reference loops 20 iterations, but every iteration recomputes
    responsibilities from the *UBM* (not the adapted model), so the update is
    idempotent — one evaluation yields the reference's fixed point exactly.

    ``frame_weights`` (N,) weights each frame's sufficient statistics; a 0/1
    mask adapts to a subset of a shared device-resident frame buffer without
    a second upload (exactly equal to slicing the subset out).

    ``adapt_vars`` / ``adapt_weights`` default True = the reference's full
    (means, variances, weights) update. Standard speaker-verification MAP
    (Reynolds et al. 2000) adapts MEANS ONLY: adapting variances shrinks a
    class model tightly around its own frames, and the quadratic penalty on
    tail frames can then exceed the density gain — measured on the surrogate
    corpus this inverts/destabilizes the LLR (train-set mean LLR flipped
    sign, eval rank-EER 0.58 vs 0.275 means-only). ``train/gmm_system``
    therefore defaults to means-only and exposes the full update as the
    parity mode.
    """
    resp = predict_proba(x, ubm)  # (N, K)
    if frame_weights is not None:
        resp = resp * frame_weights[:, None]
    nk = jnp.sum(resp, axis=0)
    fk = resp.T @ x
    sk = resp.T @ (x * x) if adapt_vars else None
    return _map_from_stats(
        ubm, nk, fk, sk, relevance_factor=relevance_factor,
        var_floor=var_floor, adapt_vars=adapt_vars, adapt_weights=adapt_weights,
    )


def _map_from_stats(
    ubm: DiagGMM,
    nk: jnp.ndarray,
    fk: jnp.ndarray,
    sk: jnp.ndarray | None,
    *,
    relevance_factor: float,
    var_floor: float,
    adapt_vars: bool,
    adapt_weights: bool,
) -> DiagGMM:
    """The closed-form MAP update from sufficient statistics — shared by the
    flat path (``map_adapt``) and the chunked path (``map_adapt_chunked``)."""
    nk = nk + 1e-6
    alpha = nk / (nk + relevance_factor)
    a = alpha[:, None]
    new_means = a * (fk / nk[:, None]) + (1.0 - a) * ubm.means
    if adapt_vars:
        new_vars = a * (sk / nk[:, None] - new_means**2) + (1.0 - a) * ubm.variances
        new_vars = jnp.maximum(new_vars, var_floor)
    else:
        new_vars = ubm.variances
    if adapt_weights:
        new_weights = alpha * (nk / jnp.sum(nk)) + (1.0 - alpha) * ubm.weights
        new_weights = new_weights / jnp.sum(new_weights)
    else:
        new_weights = ubm.weights
    return DiagGMM(weights=new_weights, means=new_means, variances=new_vars)


def map_adapt_chunked(
    ubm: DiagGMM,
    x: jnp.ndarray,
    *,
    chunk: int = 65536,
    relevance_factor: float = 10.0,
    var_floor: float = 1e-6,
    frame_weights: jnp.ndarray | None = None,
    adapt_vars: bool = True,
    adapt_weights: bool = True,
) -> DiagGMM:
    """``map_adapt`` for frame buffers whose (N, K) responsibility matrix
    exceeds HBM: sufficient statistics accumulate over a ``lax.scan`` of
    fixed-size chunks (the same accumulator EM's chunked fallback uses), so
    only (chunk, K) is ever materialized. Numerically equal to the flat
    path up to summation order."""
    n = x.shape[0]
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    w = (
        frame_weights.astype(x.dtype)
        if frame_weights is not None
        else jnp.ones(n, x.dtype)
    )
    xc = jnp.pad(x, ((0, pad), (0, 0))).reshape(n_chunks, chunk, -1)
    wc = jnp.pad(w, (0, pad)).reshape(n_chunks, chunk)
    k, d = ubm.means.shape

    def body(carry, cw):
        nk, fk, sk = carry
        cnk, cfk, csk, _ll = _estep_stats(cw[0], cw[1], ubm)
        return (nk + cnk, fk + cfk, sk + csk), None

    init = (
        jnp.zeros((k,), x.dtype),
        jnp.zeros((k, d), x.dtype),
        jnp.zeros((k, d), x.dtype),
    )
    (nk, fk, sk), _ = jax.lax.scan(body, init, (xc, wc))
    return _map_from_stats(
        ubm, nk, fk, sk if adapt_vars else None, relevance_factor=relevance_factor,
        var_floor=var_floor, adapt_vars=adapt_vars, adapt_weights=adapt_weights,
    )


def to_numpy(gmm: DiagGMM) -> dict[str, np.ndarray]:
    return {
        "weights": np.asarray(gmm.weights),
        "means": np.asarray(gmm.means),
        "variances": np.asarray(gmm.variances),
    }


def from_numpy(d: dict[str, np.ndarray]) -> DiagGMM:
    return DiagGMM(
        weights=jnp.asarray(d["weights"], jnp.float32),
        means=jnp.asarray(d["means"], jnp.float32),
        variances=jnp.asarray(d["variances"], jnp.float32),
    )
