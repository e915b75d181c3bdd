"""End-to-end slice on TPU: full-size DBSR train -> checkpoint -> val-set
generation -> eval protocol (PSNR/SSIM report)."""
import fcntl, sys, time, os
_lk = open("/tmp/tpu_probe.lock", "w")
fcntl.flock(_lk, fcntl.LOCK_EX)
import numpy as np
import jax, jax.numpy as jnp, optax
from dbsr_tpu.data.synthetic import BurstConfig, synthesize_batch
from dbsr_tpu.models.dbsr import dbsrnet_cvpr2021
from dbsr_tpu.training.actors import make_synthetic_actor
from dbsr_tpu.training.state import TrainState, make_optimizer
from dbsr_tpu.training.checkpoint import save_checkpoint

WORK = "/tmp/e2e_work"
os.makedirs(WORK, exist_ok=True)

# procedural smooth images as the Zurich stand-in
def make_images(n=6, hw=(512, 512), seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for i in range(n):
        low = rng.rand(hw[0]//16, hw[1]//16, 3)
        img = np.kron(low, np.ones((16,16,1)))
        img += 0.15*np.kron(rng.rand(hw[0]//4, hw[1]//4, 3), np.ones((4,4,1)))
        out.append(np.clip(img/1.15, 0, 1).astype(np.float32))
    return out
IMAGES = make_images()

cfg = BurstConfig(fused_resample=True)   # train config: 8-frame
net = dbsrnet_cvpr2021(train_alignment=True, dtype=jnp.bfloat16,
                       fused_s2d_decoder=True)
actor = make_synthetic_actor(net, boundary_ignore=40)
tx = make_optimizer(1e-4, 40, 0.2, 1000)
B = 8

def crops_batch(rng):
    out = []
    for _ in range(B):
        im = IMAGES[rng.randint(len(IMAGES))]
        r = rng.randint(0, im.shape[0]-432+1); c = rng.randint(0, im.shape[1]-432+1)
        out.append(im[r:r+432, c:c+432])
    return np.stack(out)

params = net.init(jax.random.key(1), jnp.zeros((1, cfg.burst_size) + cfg.burst_hw + (4,)))
state = TrainState.create(params, tx)

@jax.jit
def train_step(state, key, crops):
    batch = synthesize_batch(key, crops, cfg)
    (loss, stats), grads = jax.value_and_grad(lambda p: actor(p, batch), has_aux=True)(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    return state.replace(step=state.step+1,
                         params=optax.apply_updates(state.params, updates),
                         opt_state=opt_state), stats

rng = np.random.RandomState(0)
t0 = time.time()
STEPS = 150
for i in range(STEPS):
    st, stats = train_step(state, jax.random.key(1000+i), jnp.asarray(crops_batch(rng)))
    state = st
    if i % 30 == 0 or i == STEPS-1:
        print(f"step {i:4d}: loss {float(stats['Loss/total']):.4f} psnr {float(stats['Stat/psnr']):.2f} ({time.time()-t0:.0f}s)", flush=True)

path = save_checkpoint(WORK, "dbsr_synthetic", 1, state, net=net)
print("saved", path, flush=True)

# generate a small val set at eval protocol shapes (14-frame)
from dbsr_tpu.data.datasets import write_synthetic_burst_val
eval_cfg = BurstConfig(burst_size=14, fused_resample=True)
synth = jax.jit(lambda k, im: __import__("dbsr_tpu.data.synthetic", fromlist=["rgb2rawburst"]).rgb2rawburst(k, im, eval_cfg))
samples = []
for i in range(4):
    im = IMAGES[i % len(IMAGES)][:432, :432]
    out = synth(jax.random.key(77+i), jnp.asarray(im))
    samples.append({"burst": np.asarray(out["burst"]),
                    "frame_gt": np.asarray(out["frame_gt"]),
                    "meta": jax.tree.map(np.asarray, out["meta"])})
val_root = os.path.join(WORK, "val")
write_synthetic_burst_val(val_root, samples)
print("val set written", flush=True)

# eval protocol
from dbsr_tpu.evaluation.synburst import compute_score
from dbsr_tpu.evaluation.network_param import NetworkParam
from dbsr_tpu.data.datasets import SyntheticBurstVal
ds = SyntheticBurstVal(val_root, burst_size=14, num_bursts=4)
scores = compute_score([NetworkParam(checkpoint_path=path, display_name="dbsr_150steps")],
                       val_root, boundary_ignore=40, with_lpips=False, dataset=ds)
# baseline: bilinear upsample of the base frame
from dbsr_tpu.ops.interp import resize_bilinear
from dbsr_tpu.ops.camera import demosaic_naive
from dbsr_tpu.ops import metrics as M
ps = []
for i in range(4):
    burst, gt, meta = ds[i]
    base = demosaic_naive(jnp.asarray(burst[0]))
    up = resize_bilinear(base, (gt.shape[0], gt.shape[1]))
    ps.append(float(M.psnr(up[None], jnp.asarray(gt)[None], boundary_ignore=40)))
print(f"bilinear-baseline psnr: {np.mean(ps):.2f} dB", flush=True)
