# Verify the MDS property of a 12x12 circulant over GF(p), p = Goldilocks:
# every square submatrix must be nonsingular (det != 0 mod p).
import itertools, sys, time
P = 0xFFFFFFFF00000001
ROW = [1, 1, 2, 1, 8, 32, 2, 256, 4096, 8, 65536, 1024]
N = 12
M = [[ROW[(j - i) % N] for j in range(N)] for i in range(N)]

def det_mod(sub):
    k = len(sub)
    a = [row[:] for row in sub]
    det = 1
    for c in range(k):
        piv = None
        for r in range(c, k):
            if a[r][c] % P:
                piv = r
                break
        if piv is None:
            return 0
        if piv != c:
            a[c], a[piv] = a[piv], a[c]
            det = P - det
        det = det * a[c][c] % P
        inv = pow(a[c][c], P - 2, P)
        for r in range(c + 1, k):
            f = a[r][c] * inv % P
            if f:
                for cc in range(c, k):
                    a[r][cc] = (a[r][cc] - f * a[c][cc]) % P
    return det

t0 = time.time()
total = 0
for k in range(1, N + 1):
    rows_list = list(itertools.combinations(range(N), k))
    for rs in rows_list:
        for cs in itertools.combinations(range(N), k):
            total += 1
            sub = [[M[r][c] for c in cs] for r in rs]
            if det_mod(sub) == 0:
                print("NOT MDS: singular %dx%d minor rows=%s cols=%s" % (k, k, rs, cs))
                sys.exit(1)
    print("k=%d done (%.0fs)" % (k, time.time() - t0), flush=True)
print("MDS VERIFIED: all %d square submatrices nonsingular (%.0fs)" % (total, time.time() - t0))
