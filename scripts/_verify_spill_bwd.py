"""Verify run: public-API VMC training on the real chip with the 2D BPTT
row-chunk spill force-engaged on a small lattice, converging vs ED."""
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax

from rnnwavefunctions_tpu import MDRNN2D, PRNN1D, TFIM1D, TFIM2D, TrainConfig, VMCTrainer
from rnnwavefunctions_tpu.ed import exact, native
from rnnwavefunctions_tpu.ops import fused_mdrnn_bwd as mbk

# --- flagship 1D recipe (money shot) ---------------------------------------
n = 10
e_exact = exact.ground_state_energy(exact.tfim1d_dense(n, 1.0))
trainer = VMCTrainer(PRNN1D(num_sites=n, units=(50,)), TFIM1D(num_sites=n, bx=1.0),
                     TrainConfig(num_samples=512))
state = trainer.init()
key = jax.random.PRNGKey(0)
t0 = time.time()
state, m = trainer.run_steps(state, key, 300)
e = float(m["mean_energy"][-1])
rel = abs(e - e_exact) / abs(e_exact)
print(f"1D N=10: E={e:.6f} exact={e_exact:.6f} rel={rel:.2e} "
      f"({300/(time.time()-t0):.0f} steps/s)", flush=True)
assert rel < 1e-3, rel

# --- MDRNN 4x4 with the spill backward FORCED (crows=1, 4 chunks) -----------
mbk._pick = lambda nx, ny, u, b: (128, 1)
e2 = native.tfim2d_ground_energy(4, 4, 3.0)  # dense 2^16 eigh is ~34 GB
tr2 = VMCTrainer(MDRNN2D(nx=4, ny=4, units=50),
                 TFIM2D(nx=4, ny=4, bx=3.0, encoding="grid"),
                 TrainConfig(num_samples=512, learning_rate=5e-3))
s2 = tr2.init()
t0 = time.time()
s2, m2 = tr2.run_steps(s2, jax.random.PRNGKey(1), 800)
e = float(m2["mean_energy"][-1])
rel = abs(e - e2) / abs(e2)
print(f"2D 4x4 spill-forced bwd: E={e:.6f} exact={e2:.6f} rel={rel:.2e} "
      f"({800/(time.time()-t0):.0f} steps/s)", flush=True)
assert rel < 5e-3, rel
print("VERIFY OK", flush=True)
