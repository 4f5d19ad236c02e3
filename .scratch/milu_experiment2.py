"""MILU omega/k sweep on flagship-aspect grids (C=100, long-thin)."""
import sys
sys.path.insert(0, "/root/repo")
exec(open("/root/repo/.scratch/milu_experiment.py").read().split('for (rr, cc) in')[0])

for (rr, cc) in [(400, 100), (1000, 100)]:
    a = grid_laplacian(rr, cc)
    A = sp.csr_matrix((a.data, a.indices, a.indptr), (a.n, a.n))
    b = np.ones(a.n)
    base = ilu0_factorize(a)
    dp = np.array([a.indptr[i] + np.searchsorted(
        a.indices[a.indptr[i]:a.indptr[i + 1]], i) for i in range(a.n)])
    for label, (m, dpos) in {
        "ilu0": (base, dp),
        "milu_0.90": milu0_factorize(a, 0.90),
        "milu_0.95": milu0_factorize(a, 0.95),
        "milu_0.97": milu0_factorize(a, 0.97),
    }.items():
        low, up, d = split(a, m, dpos)
        row = [f"n={a.n} {label}: dmin={d.min():.3f}"]
        _, it_e, ok_e = pbicgstab(A, b, lambda f: exact_msolve(low, up, d, f))
        row.append(f"exact={it_e}{'' if ok_e else '!'}")
        for k in (3, 4, 6):
            _, it_s, ok_s = pbicgstab(
                A, b, lambda f: series_msolve(low, up, d, f, k))
            row.append(f"k={k}:{it_s}{'' if ok_s else '!'}")
        print("  ".join(row), flush=True)
