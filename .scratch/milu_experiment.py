"""Does MILU(0) (row-sum-preserving modified ILU, with relaxation omega)
cut BiCGSTAB iterations on the grid-Laplacian family — AND does the win
survive the truncated Neumann-series application (k=3/4) the TPU msolve
uses?  Pure numpy/scipy; f64.  MILU shrinks U's diagonal, which grows
rho(N_u) and may break the truncated series — that is the question."""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import scipy.sparse as sp

from cuda_mat_tpu.models.problems import grid_laplacian
from cuda_mat_tpu.reference.cpu_solvers import ilu0_factorize


def milu0_factorize(a, omega=1.0):
    """ILU(0) with the dropped fill scaled by ``omega`` subtracted from the
    diagonal (omega=0 -> plain ILU(0); omega=1 -> full MILU, row sums of LU
    equal row sums of A)."""
    n = a.n
    m = a.data.astype(np.float64).copy()
    indptr, indices = a.indptr, a.indices
    diag_pos = np.empty(n, dtype=np.int64)
    for i in range(n):
        lo, hi = indptr[i], indptr[i + 1]
        js = indices[lo:hi]
        k = np.searchsorted(js, i)
        diag_pos[i] = lo + k
    for i in range(n):
        lo, hi = indptr[i], indptr[i + 1]
        dropped = 0.0
        for kk in range(lo, int(diag_pos[i])):
            k = indices[kk]
            m[kk] = m[kk] / m[diag_pos[k]]
            lik = m[kk]
            klo, khi = int(diag_pos[k]) + 1, indptr[k + 1]
            if klo >= khi:
                continue
            row_i_js = indices[kk + 1:hi]
            row_k_js = indices[klo:khi]
            pos = np.searchsorted(row_i_js, row_k_js)
            ok = pos < row_i_js.shape[0]
            ok[ok] &= row_i_js[pos[ok]] == row_k_js[ok]
            upd = lik * m[klo:khi]
            m[kk + 1 + pos[ok]] -= upd[ok]
            dropped += upd[~ok].sum()
        m[diag_pos[i]] -= omega * dropped
    return m, diag_pos


def split(a, m, diag_pos):
    n = a.n
    rows = np.repeat(np.arange(n), np.diff(a.indptr))
    cols = a.indices
    low = sp.csr_matrix((m[cols < rows], (rows[cols < rows],
                                          cols[cols < rows])), (n, n))
    d = m[diag_pos]
    upm = cols > rows
    up = sp.csr_matrix((m[upm] / d[rows[upm]], (rows[upm], cols[upm])),
                       (n, n))
    return low, up, d


def series_msolve(low, up, d, f, k):
    y = f.copy()
    t = f.copy()
    for _ in range(k - 1):
        t = -(low @ t)
        y += t
    g = y / d
    x = g.copy()
    t = g.copy()
    for _ in range(k - 1):
        t = -(up @ t)
        x += t
    return x


def exact_msolve(low, up, d, f):
    n = f.shape[0]
    y = sp.linalg.spsolve_triangular(
        (sp.eye(n) + low).tocsr(), f, lower=True, unit_diagonal=True)
    x = sp.linalg.spsolve_triangular(
        (sp.eye(n) + up).tocsr(), y / d, lower=False)
    return x


def pbicgstab(A, b, msolve, maxit=2000, tol=1e-6):
    x = np.ones(b.shape[0])
    r = b - A @ x
    rw = r.copy()
    n0 = np.linalg.norm(r)
    rho = alpha = omega = 1.0
    p = np.zeros_like(b)
    v = np.zeros_like(b)
    for i in range(maxit):
        rhop = rho
        rho = rw @ r
        beta = 0.0 if i == 0 else (rho / rhop) * (alpha / omega)
        p = r + beta * (p - omega * v)
        pw = msolve(p)
        v = A @ pw
        alpha = rho / (rw @ v)
        r = r - alpha * v
        x = x + alpha * pw
        if np.linalg.norm(r) < tol * n0:
            return x, i, True
        s = msolve(r)
        t = A @ s
        omega = (t @ r) / (t @ t)
        x = x + omega * s
        r = r - omega * t
        if np.linalg.norm(r) < tol * n0:
            return x, i + 1, True
    return x, maxit, False


for (rr, cc) in [(100, 100), (40, 126), (317, 126)]:
    a = grid_laplacian(rr, cc)
    A = sp.csr_matrix((a.data, a.indices, a.indptr), (a.n, a.n))
    b = np.ones(a.n)
    base = ilu0_factorize(a)
    dp = np.array([a.indptr[i] + np.searchsorted(
        a.indices[a.indptr[i]:a.indptr[i + 1]], i) for i in range(a.n)])
    for label, (m, dpos) in {
        "ilu0": (base, dp),
        "milu_1.0": milu0_factorize(a, 1.0),
        "milu_0.95": milu0_factorize(a, 0.95),
        "milu_0.5": milu0_factorize(a, 0.5),
    }.items():
        low, up, d = split(a, m, dpos)
        row = [f"n={a.n} {label}: dmin={d.min():.3f}"]
        _, it_e, ok_e = pbicgstab(A, b, lambda f: exact_msolve(low, up, d, f))
        row.append(f"exact={it_e}{'' if ok_e else '!'}")
        for k in (3, 4):
            _, it_s, ok_s = pbicgstab(
                A, b, lambda f: series_msolve(low, up, d, f, k))
            row.append(f"series k={k}: {it_s}{'' if ok_s else '!'}")
        print("  ".join(row), flush=True)
