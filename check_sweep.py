import jax, numpy as np
import jax.numpy as jnp
from supersampler_tpu import enable_compilation_cache
enable_compilation_cache()
from supersampler_tpu.core.scalar import compute_threshold
from supersampler_tpu.ops import field as F

k, m, s = 31, 11, 5.0
P, L = 8192, 7900
W = k - m + 1
rng = np.random.default_rng(3)
codes = np.zeros(P, np.uint8)
codes[:L] = rng.integers(0, 4, L, dtype=np.uint8)
thr = compute_threshold(k, m, s)
thi, tlo = jnp.uint32(thr >> 32), jnp.uint32(thr & 0xFFFFFFFF)
t = jax.jit(F.scan_field_2d, static_argnums=(1, 2, 3, 5))(
    jnp.asarray(codes), k, m, P, jnp.int32(L), True)
n_blk = P // F._B
tT = F._transpose_tables(t, n_blk)
sync2 = t.sync.reshape(n_blk, F._B)
has_sync = jnp.any(sync2, axis=1)
fs = jnp.where(has_sync, jnp.argmax(sync2, axis=1).astype(jnp.int32), F._B)
zst = F.FieldState(
    val=jnp.zeros((n_blk,), jnp.uint32),
    h_hi=jnp.full((n_blk,), 0xFFFFFFFF, jnp.uint32),
    h_lo=jnp.full((n_blk,), 0xFFFFFFFF, jnp.uint32),
    p=jnp.zeros((n_blk,), jnp.int32),
    last_ev=jnp.full((n_blk,), -1, jnp.int32),
    n_ev=jnp.zeros((n_blk,), jnp.int32))
end = jnp.full((n_blk,), F._B, jnp.int32)
capl = 16
sa, ev, pval, plast, isent = F._sweep(tT, t.last_i, W, n_blk, zst, fs,
                                      end, has_sync, True, thi, tlo)
a = (sa,) + F._lists_from_dense(ev, pval, plast, isent, n_blk, capl)
b = F._sweep_pallas(tT, t.last_i, W, n_blk, zst, fs, end, has_sync, True,
                    thi, tlo, capl, interpret=False)
for f, (xa, ya) in enumerate(zip(a[0], b[0])):
    assert np.all(np.asarray(xa) == np.asarray(ya)), ("state", f)
for i in range(1, 5):
    assert np.all(np.asarray(a[i]) == np.asarray(b[i])), i
z = jnp.zeros((n_blk,), jnp.int32)
sa2, ev2, pval2, plast2, ise2 = F._sweep(tT, t.last_i, W, n_blk, zst,
                                         z, fs, has_sync, False, thi,
                                         tlo)
a2 = (sa2,) + F._lists_from_dense(ev2, pval2, plast2, ise2, n_blk, capl)
b2 = F._sweep_pallas(tT, t.last_i, W, n_blk, zst, z, fs, has_sync, False,
                     thi, tlo, capl, interpret=False)
for f, (xa, ya) in enumerate(zip(a2[0], b2[0])):
    assert np.all(np.asarray(xa) == np.asarray(ya)), ("state2", f)
for i in range(1, 5):
    assert np.all(np.asarray(a2[i]) == np.asarray(b2[i])), ("o2", i)
# full resolve on chip vs CPU-XLA resolve is covered by the smoke test
print("OK: Mosaic list-emitting sweep == XLA sweep+converter on chip")
