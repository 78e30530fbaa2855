"""Pure-Python oracles for differential testing (exact integer arithmetic)."""

P = 0xFFFFFFFF00000001


def gl_add(a, b):
    return (a + b) % P


def gl_sub(a, b):
    return (a - b) % P


def gl_mul(a, b):
    return (a * b) % P


def gl_inv(a):
    return pow(a, P - 2, P) if a else 0


def fp2_mul(x, y, w=7):
    a, b = x
    c, d = y
    return ((a * c + w * b * d) % P, (a * d + b * c) % P)


def fp2_inv(x, w=7):
    a, b = x
    norm = (a * a - w * b * b) % P
    ninv = gl_inv(norm)
    return (a * ninv % P, (-b) * ninv % P)


def ntt_naive(values, root):
    """O(n^2) NTT: X_k = sum_j x_j root^(jk)."""
    n = len(values)
    return [
        sum(values[j] * pow(root, j * k, P) for j in range(n)) % P
        for k in range(n)
    ]
