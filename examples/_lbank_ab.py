import numpy as np, jax.numpy as jnp
from bench import _bench
from gst_plugins_rs_tpu.parallel.streams import loudnorm_bank
from gst_plugins_rs_tpu.ops import loudnorm as LN

rng = np.random.RandomState(3)
LNS = 16
first3 = jnp.asarray(rng.uniform(-0.5,0.5,(LNS, LN.GAIN_LOOKAHEAD, 2)).astype(np.float32))

bank = loudnorm_bank(LNS, channels=2)
bank.first_frame(first3)
lframe = jnp.asarray(rng.uniform(-0.5,0.5,(LNS, LN.FRAME, 2)).astype(np.float32))
def stepA(states):
    bank.states = states
    bank.process(lframe)
    return bank.states
dt = _bench(stepA, bank.states, iters=30)
print(f"process (1 frame/stream): {dt*1000:.2f} ms/dispatch -> {LNS*0.1/dt:.1f}x aggregate", flush=True)

for K in (4, 16):
    bank2 = loudnorm_bank(LNS, channels=2)
    bank2.first_frame(first3)
    lframes = jnp.asarray(rng.uniform(-0.5,0.5,(LNS, K, LN.FRAME, 2)).astype(np.float32))
    def stepB(states):
        bank2.states = states
        bank2.process_many(lframes)
        return bank2.states
    dt = _bench(stepB, bank2.states, iters=10)
    print(f"process_many K={K}: {dt*1000:.2f} ms/dispatch -> {LNS*K*0.1/dt:.1f}x aggregate ({dt*1000/K:.2f} ms/frame-tick)", flush=True)
