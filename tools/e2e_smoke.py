"""End-to-end smoke: drive the framework through its public API (train a
tiny ModalTune on synthetic bags, extract embeddings). Runs on whatever
backend JAX selects (real TPU under axon). Used by the verify skill."""
import time
import jax, jax.numpy as jnp, numpy as np

print("backend:", jax.default_backend(), jax.devices())

from modaltune_tpu.configs import TrainConfig, tiny_test_config
from modaltune_tpu.data import BucketedLoader, SyntheticSlideDataset
from modaltune_tpu.models import create_aggregator
from modaltune_tpu.train import (TextProjector, TrainState, make_optimizer,
                                 make_train_step, make_embed_step,
                                 project_text)

cfg = tiny_test_config()
ds = SyntheticSlideDataset(n_cases=6, in_chans=cfg.backbone.in_chans,
                           bag_range=(100, 400), seed=0)
model = create_aggregator("longnetvit_gene_adapter", cfg=cfg,
                          n_gene_groups=ds.packer.n_groups,
                          max_group_len=ds.packer.max_group_len)
loader = BucketedLoader(ds, buckets=(255, 511), batch_size=1, seed=0)
batch = next(iter(loader))
params = jax.jit(lambda r: model.init(
    r, jnp.asarray(batch.bag), jnp.asarray(batch.coords),
    jnp.asarray(batch.genes), task_token=jnp.eye(3)[:1],
    bag_mask=jnp.asarray(batch.mask))["params"])(jax.random.PRNGKey(0))

tcfg = TrainConfig(lr=2e-3, num_epochs=3, warmup_epochs=1)
tx = make_optimizer(tcfg, steps_per_epoch=len(loader))
state = TrainState.create(params, tx)
step_fn = make_train_step(model, tcfg, donate=False)
embed_fn = make_embed_step(model, tcfg)
projector = TextProjector()
pp = projector.init(jax.random.PRNGKey(7), jnp.zeros((1, 4, 512)))["params"]

rng = jax.random.PRNGKey(1)
losses = []
t0 = time.time()
for epoch in range(2):
    for b in loader:
        inputs = dict(bag=jnp.asarray(b.bag), coords=jnp.asarray(b.coords),
                      mask=jnp.asarray(b.mask), genes=jnp.asarray(b.genes))
        text = project_text(projector, pp, jnp.asarray(b.text))
        rng, sub = jax.random.split(rng)
        state, loss = step_fn(state, inputs, text, sub)
        losses.append(float(loss))
print(f"trained {len(losses)} steps in {time.time()-t0:.1f}s "
      f"(first={losses[0]:.4f} last={losses[-1]:.4f})")
assert np.all(np.isfinite(losses)), "non-finite loss"
assert losses[-1] < losses[0], "loss did not decrease"

emb = embed_fn(state, inputs)
print("embeddings:", emb.shape, "finite:", bool(np.all(np.isfinite(emb))))

# probe 1: unknown aggregator name -> helpful error
try:
    create_aggregator("nope")
    print("PROBE1 FAIL: no error")
except ValueError as e:
    print("PROBE1 OK:", str(e)[:100])

# probe 2: bag longer than threshold gets subsampled (sorted)
ds2 = SyntheticSlideDataset(n_cases=1, in_chans=8, bag_range=(300, 301),
                            threshold=100, seed=3)
ex = ds2.get(0, np.random.RandomState(0))
print("PROBE2 OK: bag", ex.bag.shape, "<= threshold 100:",
      ex.bag.shape[0] <= 100)
print("E2E VERIFY PASS")
