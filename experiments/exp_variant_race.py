import functools, itertools, math, time
import numpy as np
import jax
import jax.numpy as jnp
import sys; sys.path.insert(0, "/root/repo")
import voltools_tpu.kernels.pallas_affine as pa
from voltools_tpu.utils import transform_matrix

D = 250
rng = np.random.default_rng(0)
vol = jnp.asarray(rng.random((D,)*3).astype(np.float32))
C = ((D-1)/2,)*3
m = transform_matrix(rotation=(60,0,0), rotation_order="rzxz", center=C)
mj = jnp.asarray(m)

def timeit(fn, *args, iters=5):
    @functools.partial(jax.jit, static_argnames='n')
    def chained(n, *a):
        def body(_, carry):
            return (fn(*carry),) + carry[1:]
        out = jax.lax.fori_loop(0, n, body, a)
        return out[0].ravel()[0]
    float(chained(1, *args)); float(chained(iters, *args))
    def run(n):
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter(); float(chained(n, *args)); best = min(best, time.perf_counter()-t0)
        return best
    return (run(iters) - run(1)) / (iters-1) * 1e3

# enumerate all feasible variants for bspline, sort by model cost, time top 4
cands = []
matrices = np.asarray(m, np.float64)[None]
order, margin, budget = 3, 4, pa._ROW_BUDGET_CUBIC
for ps in [(1,2,0),(0,2,1),(0,1,2),(2,1,0),(2,0,1),(1,0,2)]:
    for po in itertools.permutations((0,1,2)):
        aa = np.max(np.stack([np.abs(pa._adjusted_matrix(mm, ps, po)) for mm in matrices]), axis=0)
        drift = 7.0*aa[2,1]
        if drift > pa._SUB_DRIFT_LIMIT: continue
        slop = 0 if drift <= 1e-5 else int(math.ceil(drift))
        spans = [aa[r,1]*7 + aa[r,2]*127 + margin + 1 for r in (0,1)]
        w0, w1 = (2*int(math.ceil(s/2)) for s in spans)
        d = tuple((D,D,D)[ps[k]] for k in range(3))
        w0, w1 = min(w0,d[0]), min(w1,d[1])
        unroll = w0*w1 <= budget
        if not unroll: continue
        v = pa.Variant(ps=ps, po=tuple(po), w0=w0, w1=w1, d=d,
                       dx_pad=((D+127)//128)*128, out_d=tuple((D,D,D)[po[k]] for k in range(3)),
                       order=3, mode="constant", slop=slop, unroll=True)
        pad = max(slop, slop+1 if slop else 1)
        cost = v.nv * ((order+1)+2*pad) * 16
        cands.append((cost, v))
cands.sort(key=lambda cv: cv[0])
for cost, v in cands[:4]:
    fn = lambda vv, mm, v=v: pa.affine_sample_pallas_variant(vv, mm, v, 0.0)
    try:
        t = timeit(fn, vol, mj, iters=5)
        print(f"cost={cost} nv={v.nv} slop={v.slop} ndx={len(v.dxs)} ps={v.ps} po={v.po} -> {t:.2f} ms")
    except Exception as e:
        print("FAIL", str(e).split(chr(10))[0][:100])
