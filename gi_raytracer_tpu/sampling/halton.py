"""Vectorized scrambled-Halton QMC engine.

Re-derivation of the classic Gruenschloss Halton sampler used by the
reference (reference include/halton_sampler.h, include/halton_enum.h) as flat
table lookups over ``jnp`` arrays, bit-comparable with the reference:

* dimension 0 is the base-2 radical inverse computed by bit reversal
  (halton_sampler.h:1417-1432),
* dimensions 1..30 are permuted radical inverses in the first 31 odd primes,
  evaluated chunk-wise through precomputed digit-permutation tables
  (halton_sampler.h:1435-…); tables use Faure digit permutations
  (halton_sampler.h:573-603),
* dimensions >= 31 fall back to pseudo-random uniforms, exactly like the
  reference falls back to ``rand()`` (halton_sampler.h:887) — callers supply
  those from a counter-based PRNG.

The pixel-stratified sample enumeration (``HaltonEnum``) implements the
Gruenschloss–Raab–Keller elementary-interval construction
(halton_enum.h:34-157): the index of the i-th sample landing in pixel (x, y)
is obtained from the Chinese Remainder Theorem over the base-2 / base-3
radical inverses of the pixel coordinates.

Everything here is trace-free host setup (NumPy tables) plus pure jittable
functions of ``uint32`` index arrays — no data-dependent shapes.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

# The 31 primes the reference's switch covers (dims 0..30); deeper dims use
# PRNG fallback, matching halton_sampler.h:626-888.
PRIMES = (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59, 61,
          67, 71, 73, 79, 83, 89, 97, 101, 103, 107, 109, 113, 127)

MAX_QMC_DIMS = len(PRIMES)  # 31

_SCALE_EPS = 0.9999998807907104  # keeps results strictly in [0,1)


def faure_permutations(max_base: int) -> list[np.ndarray | None]:
    """Faure digit permutations for every base up to ``max_base``.

    Standard recursive construction (Faure 1992; cf. halton_sampler.h:573-603):
    identity for bases 1..3; even base 2c interleaves the doubled base-c
    permutation with its doubled-plus-one copy; odd base 2c+1 re-centers the
    base-2c permutation around a fixed middle digit c.
    """
    perms: list[np.ndarray | None] = [None] * (max_base + 1)
    for k in range(1, min(3, max_base) + 1):
        perms[k] = np.arange(k, dtype=np.uint16)
    for base in range(4, max_base + 1):
        b = base // 2
        if base & 1:
            prev = perms[base - 1]
            p = np.empty(base, dtype=np.uint16)
            vals = prev + (prev >= b)
            idx = np.arange(base - 1)
            p[idx + (idx >= b)] = vals
            p[b] = b
        else:
            half = perms[b].astype(np.uint16)
            p = np.empty(base, dtype=np.uint16)
            p[:b] = 2 * half
            p[b:] = 2 * half + 1
        perms[base] = p
    return perms


def _table_digits(p: int) -> int:
    """Digits per lookup chunk: largest k with p**k <= 361 (table <= 361 ints,
    mirroring the reference's table sizing, halton_sampler.h:890-960)."""
    k = 1
    while p ** (k + 1) <= 361:
        k += 1
    return k


def _total_chunks(p: int, k: int) -> int:
    """Number of chunks: floor(D_max / k) where p**D_max fits in uint32."""
    d = 1
    while p ** (d + 1) <= 0xFFFFFFFF:
        d += 1
    return d // k


def _build_table(p: int, perm: np.ndarray, k: int) -> np.ndarray:
    """table[i] = digit-reversed, permuted value of the k-digit chunk i."""
    size = p ** k
    i = np.arange(size, dtype=np.uint64)
    out = np.zeros(size, dtype=np.uint64)
    rem = i.copy()
    for _ in range(k):
        out = out * p + perm[rem % p]
        rem //= p
    return out.astype(np.uint32)


def _reverse_bits32(x: jnp.ndarray) -> jnp.ndarray:
    """Full 32-bit reversal (halton_enum.h:136-144)."""
    x = x.astype(jnp.uint32)
    x = (x << 16) | (x >> 16)
    x = ((x & jnp.uint32(0x00FF00FF)) << 8) | ((x & jnp.uint32(0xFF00FF00)) >> 8)
    x = ((x & jnp.uint32(0x0F0F0F0F)) << 4) | ((x & jnp.uint32(0xF0F0F0F0)) >> 4)
    x = ((x & jnp.uint32(0x33333333)) << 2) | ((x & jnp.uint32(0xCCCCCCCC)) >> 2)
    x = ((x & jnp.uint32(0x55555555)) << 1) | ((x & jnp.uint32(0xAAAAAAAA)) >> 1)
    return x


def halton2(index: jnp.ndarray) -> jnp.ndarray:
    """Base-2 radical inverse via bit reversal written into a float mantissa,
    bit-matching halton_sampler.h:1417-1432."""
    rev = _reverse_bits32(index)
    bits = jnp.uint32(0x3F800000) | (rev >> 9)
    return jax.lax.bitcast_convert_type(bits, jnp.float32) - jnp.float32(1.0)


class HaltonSampler:
    """Scrambled Halton sampler over device-resident permutation tables.

    ``sample(dim, index)`` takes a *static* dimension and a uint32 index array
    and returns float32 samples in [0, 1), matching the reference's
    ``Halton_sampler::sample`` for dims 0..30.
    """

    def __init__(self, scramble: str = "faure", seed: int | None = None):
        max_base = PRIMES[-1]
        if scramble == "faure":
            perms = faure_permutations(max_base)
        elif scramble == "random":
            rng = np.random.default_rng(seed)
            perms = [None] * (max_base + 1)
            for b in range(1, max_base + 1):
                p = np.arange(b, dtype=np.uint16)
                if b > 3:
                    rng.shuffle(p)
                perms[b] = p
        elif scramble == "none":
            perms = [np.arange(b, dtype=np.uint16) for b in range(max_base + 1)]
        else:
            raise ValueError(f"unknown scramble: {scramble}")

        # Tables stay HOST-side NumPy: a jnp closure constant would live on
        # the device and be fetched back during every jit lowering (several
        # seconds per round-trip through a remote-TPU tunnel); NumPy
        # constants embed into the MLIR module directly.
        self._tables: dict[int, np.ndarray] = {}
        self._meta: dict[int, tuple[int, int, float]] = {}
        for p in PRIMES[1:]:
            k = _table_digits(p)
            c = _total_chunks(p, k)
            self._tables[p] = _build_table(p, perms[p], k)
            self._meta[p] = (k, c, _SCALE_EPS / float(p ** (k * c)))

    @functools.partial(jax.jit, static_argnums=(0, 1))
    def sample(self, dim: int, index: jnp.ndarray) -> jnp.ndarray:
        """QMC sample for static dimension ``dim`` at uint32 ``index``."""
        if not (0 <= dim < MAX_QMC_DIMS):
            raise ValueError(
                f"dim {dim} outside QMC range [0,{MAX_QMC_DIMS}); "
                "use the PRNG fallback for deeper dims")
        index = index.astype(jnp.uint32)
        if dim == 0:
            return halton2(index)
        p = PRIMES[dim]
        k, c, scale = self._meta[p]
        table = jnp.asarray(self._tables[p])
        chunk = np.uint32(p ** k)
        acc = jnp.zeros(index.shape, dtype=jnp.uint32)
        div = index
        for i in range(c):
            digits = table[(div % chunk).astype(jnp.int32)]
            acc = acc + digits * np.uint32(p ** (k * (c - 1 - i)))
            if i + 1 < c:
                div = div // chunk
        return acc.astype(jnp.float32) * jnp.float32(scale)


def _halton3_inverse_host(index: int, digits: int) -> int:
    r = 0
    for _ in range(digits):
        r = r * 3 + index % 3
        index //= 3
    return r


class HaltonEnum:
    """Pixel-stratified Halton index enumeration (halton_enum.h:34-157).

    For a W x H frame, precomputes a per-pixel CRT offset image so that
    ``index(i, x, y) = offset[y, x] + i * increment`` enumerates exactly the
    Halton indices whose (dim0, dim1) sample lands in pixel (x, y).
    """

    def __init__(self, width: int, height: int):
        assert width > 0 and height > 0
        self.width, self.height = width, height
        p2, w = 0, 1
        while w < width:
            p2, w = p2 + 1, w * 2
        p3, h = 0, 1
        while h < height:
            p3, h = p3 + 1, h * 3
        self.scale_x = float(w)
        self.scale_y = float(h)
        self.increment = w * h
        # multiplicative inverses via extended euclid (halton_enum.h:126-134)
        inv2 = pow(h, -1, w) if w > 1 else 0
        inv3 = pow(w, -1, h) if h > 1 else 0
        self._mx = h * inv2
        self._my = w * inv3
        self._p2, self._p3, self._w, self._h = p2, p3, w, h

        # Precompute per-pixel offsets on host (W*H uint32; tiny).
        xs = np.arange(width, dtype=np.uint64)
        # base-2 digit reversal of x over p2 digits
        hx = np.zeros_like(xs)
        rem = xs.copy()
        for _ in range(p2):
            hx = (hx << 1) | (rem & 1)
            rem >>= 1
        ys = np.arange(height, dtype=np.uint64)
        hy = np.zeros_like(ys)
        rem = ys.copy()
        for _ in range(p3):
            hy = hy * 3 + rem % 3
            rem //= 3
        off = (hx[None, :] * np.uint64(self._mx)
               + hy[:, None] * np.uint64(self._my)) % np.uint64(self.increment)
        # host NumPy, not jnp: see HaltonSampler.__init__ on lowering cost
        self.offsets = off.astype(np.uint32)  # (H, W)

    @property
    def max_samples_per_pixel(self) -> int:
        return 0xFFFFFFFF // self.increment

    def get_index(self, i: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """Index of the i-th sample in pixel (x, y) (halton_enum.h:106-114)."""
        off = jnp.asarray(self.offsets)[y, x]
        return (off + i.astype(jnp.uint32) * jnp.uint32(self.increment)).astype(jnp.uint32)

    def index_image(self, i) -> jnp.ndarray:
        """(H, W) indices for sample wave ``i`` across the whole frame."""
        i = jnp.asarray(i, dtype=jnp.uint32)
        return jnp.asarray(self.offsets) + i * jnp.uint32(self.increment)
