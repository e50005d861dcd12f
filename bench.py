"""Benchmark: SML inner-loop training throughput (examples/s) on TPU.

Workload: one Yelp-scale synthetic period (100k users / 20k items / d=64),
the SML inner step at reference hyper-parameters — BCE loss through the
frozen conv transfer, dense torch-semantics Adam over the full tables,
on-device rejection-sampled negatives, batch 1024 (reference
``model/transfer.py:417-534``; ``main_yelp.py:34-47``).

Baseline: the same math implemented in PyTorch on CPU (the reference is
pure PyTorch and this host has no CUDA), measured on a subset and scaled.
``vs_baseline`` = our examples/s / torch-CPU examples/s.

Prints ONE JSON line to stdout; diagnostics go to stderr.
"""

import json
import os
import sys
import time

import numpy as np

N_USERS, N_ITEMS, DIM = 100_000, 20_000, 64
N_INTER = 500_000
NEG_COLS = 999          # presampled pool width (reference README.md:25)
BATCH = 1024
TIMED_EPOCHS = 3
TRIAL_SECONDS = 10.0    # target wall per timed scan dispatch
MIN_CLEAN_TRIALS = 5    # stop once this many trials agree within 10%
MAX_TRIALS = 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _device_mem_line():
    """Best-effort device-occupancy line for OOM diagnostics."""
    try:
        import jax
        stats = jax.local_devices()[0].memory_stats() or {}
        used = stats.get("bytes_in_use")
        limit = stats.get("bytes_limit")
        if used is not None:
            return (f"device mem: {used / 2**20:,.0f} MiB in use"
                    + (f" / {limit / 2**20:,.0f} MiB" if limit else ""))
    except Exception as e:
        return f"device mem: unavailable ({type(e).__name__})"
    return "device mem: unavailable"


def _is_oom(exc):
    return "RESOURCE_EXHAUSTED" in repr(exc)


def oom_retry(fn, label, attempts=5, base_delay=20.0, sleep=time.sleep):
    """Run ``fn`` retrying on TPU RESOURCE_EXHAUSTED with backoff.

    The driver runs bench.py at round end, when a straggler measurement
    lane may still hold most of HBM (round 3's official bench artifact was
    an OOM stack trace for exactly this reason). Device-memory pressure
    from a co-resident process is transient — the co-tenant exits — so the
    right behavior is wait-and-retry, not crash. Non-OOM errors propagate
    immediately. Total worst-case backoff ~= base_delay * (2^(attempts-1)-1)
    (default 20+40+80+160 = 300 s), bounded so the driver's window holds."""
    for attempt in range(attempts):
        try:
            return fn()
        except Exception as e:
            if not _is_oom(e) or attempt == attempts - 1:
                raise
            delay = base_delay * (2 ** attempt)
            log(f"[{label}] attempt {attempt + 1}/{attempts} hit "
                f"RESOURCE_EXHAUSTED; {_device_mem_line()}; "
                f"retrying in {delay:.0f}s")
            try:
                import jax
                jax.clear_caches()   # drop live executables/buffers we hold
            except Exception:
                pass
            sleep(delay)


def clean_trials(rates, frac=0.9):
    """The stall-rejection rule: trials within ``frac`` of the fastest.

    Tunnel stalls only ever SLOW a trial down (same reasoning as the
    pinned torch denominator), so the fastest trial anchors the clean
    set and a contaminated trial can never enter it. Returns the sorted
    clean subset."""
    if not rates:
        return []
    top = max(rates)
    return sorted(r for r in rates if r >= frac * top)


def preflight(attempts=5, base_delay=20.0, sleep=time.sleep):
    """Tiny allocate-compute-fetch probe (with the same OOM retry) before
    the heavyweight workload, so a busy device is detected in seconds, not
    after a multi-hundred-second compile."""
    def probe():
        import jax
        import jax.numpy as jnp
        x = jnp.ones((256, 256), jnp.float32)
        val = float(jnp.sum(x * 2.0))
        assert val == 131072.0, val
        return jax.default_backend()

    backend = oom_retry(probe, "preflight", attempts=attempts,
                        base_delay=base_delay, sleep=sleep)
    log(f"preflight ok: backend={backend}; {_device_mem_line()}")


def make_data(rng):
    users = rng.integers(0, N_USERS, N_INTER)
    items = (rng.pareto(1.2, N_INTER) * 50).astype(np.int64) % N_ITEMS
    inter = np.stack([users, items], axis=1)
    return np.unique(inter, axis=0)


def bench_jax(inter, mf_sample, rng):
    import jax
    import jax.numpy as jnp

    from sml_tpu.config import SMLConfig, TransferConfig
    from sml_tpu.train.engine import SMLEngine

    if mf_sample == "all":
        # eval-format presampled rows, the reference's Yelp default
        # (main_yelp.py:46; dataset2.py:319-324)
        rows = np.concatenate(
            [inter, rng.integers(0, N_ITEMS, (inter.shape[0], NEG_COLS))],
            axis=1)
    else:
        rows = inter
    cfg = SMLConfig(mf_batch_size=BATCH, latent_dim=DIM,
                    transfer=TransferConfig(latent_dim=DIM),
                    mf_sample=mf_sample)
    engine = SMLEngine(cfg, N_USERS, N_ITEMS)
    state = engine.init_state()
    state = engine.snapshot_last(state)
    padded, index = engine.prep_inner(rows)

    # warmup/compile. NOTE: block_until_ready is unreliable on the axon
    # platform — force completion by materializing a scalar on host.
    t0 = time.time()
    state, losses = engine.inner_epoch(state, padded, index)
    warm_loss = float(losses.mean())
    log(f"jax[{mf_sample}] warmup (compile + 1 epoch): {time.time() - t0:.1f}s "
        f"loss={warm_loss:.4f} backend={jax.default_backend()}")

    # single-dispatch epoch time (diagnostic; also sizes the scan below)
    t0 = time.time()
    state, losses = engine.inner_epoch(state, padded, index)
    float(losses.sum())
    epoch_dt = time.time() - t0
    log(f"jax[{mf_sample}] one dispatched epoch: {epoch_dt:.2f}s "
        f"({inter.shape[0] / epoch_dt:,.0f} ex/s incl. dispatch RTT)")

    # Device-time protocol (VERDICT r4 "Next" #1). The device sits behind
    # the axon tunnel, whose throughput stalls for seconds at random
    # (tunnel_bw_r3.json: ~32 ms dispatch RTT, ~40 MB/s); round 4's scored
    # capture lost 2.2x to two stalled 10 s trials. Two defenses, same
    # reasoning as the pinned torch denominator (stalls only ever SLOW the
    # loop down): (1) run E epochs inside ONE lax.scan dispatch so a trial
    # exposes a single dispatch + one scalar fetch to the tunnel instead
    # of ~25; (2) keep trialling (<= MAX_TRIALS) until MIN_CLEAN_TRIALS
    # agree within 10% of the fastest, then report the median of that
    # clean set — a contaminated trial is self-evident in the logged raw
    # list and cannot move the reported value.
    from sml_tpu.train.steps import make_inner_epoch
    inner = make_inner_epoch(cfg, engine.mf_tx)
    n_scan = int(np.clip(round(TRIAL_SECONDS / max(epoch_dt, 1e-3)), 4, 64))

    @jax.jit
    def scan_epochs(mf, opt, theta, last_u, last_i, rows, mask, n_real,
                    key, index):
        def body(c, _):
            mf, opt, key = c
            key, k = jax.random.split(key)
            mf, opt, losses = inner(mf, opt, theta, last_u, last_i,
                                    rows, mask, n_real, k, index)
            return (mf, opt, key), losses.sum()
        (mf, opt, key), s = jax.lax.scan(body, (mf, opt, key), None,
                                         length=n_scan)
        return mf, opt, key, s.sum()

    def one_trial(st):
        t0 = time.time()
        mf, opt, key, s = scan_epochs(
            st.mf, st.mf_opt, st.theta, st.last_user, st.last_item,
            padded.rows, padded.mask, jnp.int32(padded.n_real), st.key,
            index)
        float(s)                               # force completion
        return st._replace(mf=mf, mf_opt=opt, key=key), time.time() - t0

    t0 = time.time()
    state, _ = one_trial(state)                # compile the scan program
    log(f"jax[{mf_sample}] scan({n_scan} epochs) compile+run: "
        f"{time.time() - t0:.1f}s")

    rates = []
    for trial in range(MAX_TRIALS):
        state, dt = one_trial(state)
        rates.append(n_scan * inter.shape[0] / dt)
        log(f"jax[{mf_sample}] trial {trial}: {n_scan} epochs x "
            f"{inter.shape[0]} examples in {dt:.2f}s "
            f"-> {rates[-1]:,.0f} ex/s")
        if len(clean_trials(rates)) >= MIN_CLEAN_TRIALS:
            break
    clean = clean_trials(rates)
    if len(clean) < MIN_CLEAN_TRIALS:
        log(f"jax[{mf_sample}] WARNING: only {len(clean)}/{len(rates)} "
            f"trials within 10% of max — tunnel badly stalled; value uses "
            f"the clean subset")
    ex_per_s = float(np.median(clean))
    spread = (clean[-1] - clean[0]) / ex_per_s if ex_per_s else float("nan")
    log(f"jax[{mf_sample}]: {ex_per_s:,.0f} ex/s = median of "
        f"{len(clean)} clean trials (clean spread {spread:.1%}; raw "
        f"trials {[f'{r:,.0f}' for r in rates]})")
    bench_jax.last_stats = {
        "trials_ex_per_s": [round(r, 1) for r in rates],
        "clean_trials": len(clean), "clean_spread": round(spread, 4),
        "scan_epochs_per_trial": n_scan,
    }

    # secondary: fused full-table transfer refresh
    t0 = time.time()
    state = engine.refresh(state)
    float(state.mf.user_emb[0, 0])
    log(f"full-table refresh (compile+run): {time.time() - t0:.2f}s")
    t0 = time.time()
    for _ in range(5):
        state = engine.refresh(state)
        float(state.mf.user_emb[0, 0])
    log(f"full-table refresh steady: {(time.time() - t0) / 5 * 1e3:.1f} ms "
        f"for {N_USERS + N_ITEMS} rows")
    return ex_per_s


def bench_torch(inter, min_trial_seconds=10.0, trials=3):
    """Reference-equivalent inner loop in PyTorch on CPU (own implementation
    of the same math: lookups -> x_com conv transfer -> BCE + L2 -> dense
    Adam on the tables).

    Round 2's 6-batch (~0.5-1 s) sample swung 2x between rounds from host
    noise alone (VERDICT r2 Weak #1). Now: threads pinned, a warmup batch,
    then ``trials`` timed windows of >=``min_trial_seconds`` each (>=30 s
    total), reporting the MEDIAN trial throughput."""
    import torch

    torch.manual_seed(0)
    torch.set_num_threads(min(4, os.cpu_count() or 4))
    d = DIM
    user_emb = torch.nn.Embedding(N_USERS, d)
    item_emb = torch.nn.Embedding(N_ITEMS, d)
    last_u = torch.randn(N_USERS, d)
    last_i = torch.randn(N_ITEMS, d)

    class Tower(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = torch.nn.Conv2d(1, 10, (3, 1))
            self.c2 = torch.nn.Conv2d(10, 5, (1, 1))
            self.f1 = torch.nn.Linear(5 * d, 512)
            self.f2 = torch.nn.Linear(512, d)

        def forward(self, x_t, x_hat):
            g = lambda v: v * torch.sigmoid(1.702 * v)
            com = (x_t * x_hat.detach()) / \
                (x_t ** 2).sum(-1, keepdim=True).sqrt().clamp_min(1e-12)
            img = torch.stack([x_t, x_hat, com.detach()], dim=1) \
                .reshape(-1, 1, 3, d)
            y = g(self.c1(img))
            y = self.c2(y).reshape(-1, 5 * d)
            return self.f2(g(self.f1(g(y))))

    ut, it = Tower(), Tower()
    opt = torch.optim.Adam(list(user_emb.parameters())
                           + list(item_emb.parameters()), lr=0.01)
    rng = np.random.default_rng(0)

    rows = inter[rng.permutation(inter.shape[0])]
    n_rows = rows.shape[0]

    def one_batch(b):
        if n_rows <= BATCH:
            chunk = rows
        else:
            chunk = rows[(b * BATCH) % (n_rows - BATCH):][:BATCH]
        u = torch.from_numpy(chunk[:, 0])
        i = torch.from_numpy(chunk[:, 1])
        j = torch.from_numpy(rng.integers(0, N_ITEMS, chunk.shape[0]))
        opt.zero_grad()
        nu = ut(last_u[u], user_emb(u))
        ni = it(last_i[i], item_emb(i))
        nj = it(last_i[j], item_emb(j))
        pos = (nu * ni).sum(-1)
        neg = (nu * nj).sum(-1)
        loss = -torch.log(torch.sigmoid(pos) + 1e-15).mean() \
            - torch.log(torch.sigmoid(-neg) + 1e-15).mean() \
            + 1e-6 * 0.5 * (user_emb(u) ** 2 + item_emb(i) ** 2
                            + item_emb(j) ** 2).sum()
        loss.backward()
        opt.step()
        return chunk.shape[0]

    one_batch(0)                                    # warmup (allocations)
    b = 1
    rates = []
    for trial in range(trials):
        t0 = time.time()
        done = 0
        while time.time() - t0 < min_trial_seconds:
            done += one_batch(b)
            b += 1
        dt = time.time() - t0
        rates.append(done / dt)
        log(f"torch-cpu trial {trial}: {done} examples in {dt:.2f}s "
            f"-> {done / dt:,.0f} ex/s")
    med = float(np.median(rates))
    spread = (max(rates) - min(rates)) / med if med else float("nan")
    log(f"torch-cpu: median {med:,.0f} ex/s over {trials} trials "
        f"(spread {spread:.1%}, threads={torch.get_num_threads()})")
    return med, rates


def enable_compile_cache():
    """Same persistent XLA cache the CLI defaults on — one shared helper
    so the env var / 'off' sentinel / threshold cannot drift."""
    from sml_tpu.utils.compile_cache import enable_compile_cache as enable
    enable(log=log)


BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_BASELINE.json")


def torch_baseline(inter):
    """The torch-CPU denominator, measured ONCE on a quiet host and then
    pinned in BENCH_BASELINE.json.

    Re-measuring it every invocation made ``vs_baseline`` swing 2x between
    rounds from host load alone (VERDICT r2 Weak #1) — the driver runs
    bench.py at round end, when background measurement lanes may still
    occupy every core, so a live re-measure times the host's load average,
    not the reference. Set SML_BENCH_REMEASURE=1 (on a quiet host) to
    refresh the pinned number."""
    if not os.environ.get("SML_BENCH_REMEASURE") \
            and os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as fh:
            rec = json.load(fh)
        log(f"torch-cpu baseline: {rec['torch_cpu_ex_per_s']:,.0f} ex/s "
            f"(pinned, measured {rec['measured_utc']}; "
            f"SML_BENCH_REMEASURE=1 to refresh)")
        return float(rec["torch_cpu_ex_per_s"])
    med, rates = bench_torch(inter)
    # pin the MAX trial, not the median: host-noise dips can only slow the
    # torch loop down, so the fastest trial is the closest estimate of the
    # reference's true quiet-host rate — and gives the most conservative
    # ours/baseline ratio
    best = round(max(rates), 1)
    rec = {"torch_cpu_ex_per_s": best,
           "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
           "trials_ex_per_s": [round(r, 1) for r in rates],
           "protocol": "3 trials x >=10 s, 4 pinned torch threads, warmup "
                       "batch excluded; pinned to the max trial (median "
                       f"was {med:,.0f})"}
    with open(BASELINE_FILE, "w") as fh:
        json.dump(rec, fh, indent=2)
    log(f"torch-cpu baseline pinned to {BASELINE_FILE}: {best:,.0f} ex/s")
    return best


def main():
    enable_compile_cache()
    rng = np.random.default_rng(42)
    inter = make_data(rng)
    log(f"workload: {inter.shape[0]} interactions, {N_USERS} users, "
        f"{N_ITEMS} items, d={DIM}")

    # Fail fast (and wait out co-tenants) before paying the big compile.
    preflight()

    # headline: the reference's default Yelp configuration (mf_sample='all').
    # Retried on RESOURCE_EXHAUSTED: this is the round's scored artifact and
    # must be capturable even if a straggler lane still holds HBM.
    ours = oom_retry(lambda: bench_jax(inter, "all", rng), "jax[all]")
    stats = getattr(bench_jax, "last_stats", {})
    # secondary: on-device Bloom rejection sampling ('alone' mode) —
    # diagnostic only, never allowed to sink the headline JSON line
    try:
        oom_retry(lambda: bench_jax(inter, "alone", rng), "jax[alone]",
                  attempts=2)
    except Exception as e:
        log(f"secondary 'alone' bench failed (non-fatal): {e!r}")
    try:
        base = torch_baseline(inter)
        vs = ours / base
    except Exception as e:  # torch missing/broken: report raw throughput
        log(f"torch baseline failed: {e}")
        vs = float("nan")

    print(json.dumps({
        "metric": "sml_inner_train_examples_per_s",
        "value": round(ours, 1),
        "unit": "examples/s",
        "vs_baseline": round(vs, 2) if vs == vs else None,
        **stats,
    }))


def respawn_main(argv, attempts=3, delay=60.0, sleep=time.sleep,
                 run=None):
    """Process-level retry around ``main()``.

    ``oom_retry`` handles transient RESOURCE_EXHAUSTED in-process, but an
    ``ABORTED: TPU backend error`` (observed mid-round-4 during a tunnel
    stall window) poisons the live jax client — only a fresh process
    recovers. The parent re-execs itself as a child (stdout inherited, so
    the ONE JSON line still reaches the driver) until a child exits 0."""
    import subprocess
    if run is None:
        def run(cmd, env):
            return subprocess.run(cmd, env=env).returncode
    env = dict(os.environ, SML_BENCH_CHILD="1")
    for attempt in range(attempts):
        rc = run([sys.executable] + argv, env)
        if rc == 0:
            return 0
        if attempt < attempts - 1:
            log(f"bench child attempt {attempt + 1}/{attempts} rc={rc}; "
                f"respawning in {delay:.0f}s")
            sleep(delay)
    return rc


if __name__ == "__main__":
    if os.environ.get("SML_BENCH_CHILD"):
        main()
    else:
        sys.exit(respawn_main([os.path.abspath(__file__)] + sys.argv[1:]))
