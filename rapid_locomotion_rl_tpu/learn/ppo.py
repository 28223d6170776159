"""PPO with teacher-student distillation — one fused, jittable iteration.

Re-creates the reference learner (reference mini_gym_learn/ppo/ppo.py:33-178
+ rollout_storage.py:7-139 + the Runner rollout loop
mini_gym_learn/ppo/__init__.py:123-203) as pure functions:

- the 24-step rollout is a `lax.scan` whose stacked outputs ARE the rollout
  storage (no separate buffer object);
- GAE is a reverse scan (rollout_storage.py:76-90), advantages normalized
  over the train-env batch;
- the update runs 5 epochs x 4 minibatches as a `lax.scan` over shuffled
  index chunks (one global permutation, reused across epochs — matching
  mini_batch_generator, rollout_storage.py:100-124);
- the adaptive-KL learning-rate rule runs *between* minibatches exactly as
  in the reference (ppo.py:110-124): the LR is part of the carried state;
- the adaptation module trains each minibatch on
  MSE(adaptation(obs_hist), stop_grad(encoder(priv_obs))) with its own Adam
  (ppo.py:156-170);
- timeout bootstrapping adds γ·V·timeout to rewards (ppo.py:81-83).

Everything here composes under jit and shard_map (see parallel/)."""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.networks import (ActorCritic, normal_entropy, normal_kl,
                               normal_log_prob)


@dataclass
class PPOArgs:
    """Reference PPO_Args (ppo.py:15-30)."""
    value_loss_coef: float = 1.0
    use_clipped_value_loss: bool = True
    clip_param: float = 0.2
    # the reference's 0.01 (ppo.py:18) — reached through the warmup ramp
    # below: CONSTANT 0.01 destabilizes the only-positive-clipped early
    # regime on this physics (std ratchets 1.0 -> 4.3, NaN by it 1250 —
    # r5_refhp, EXPERIMENTS.md §24), while constant 0 pins sigma at the
    # min_std floor and drags the adaptive LR to 1e-4 by it 400. The
    # round-5 default (0.01 ramped over 300 iters + min_std 0.2) beats
    # the reference's own early curve: command_area 0.125 and
    # tracking_lin_vel 14.2 at it 1000 vs the reference's 0.115 / 13.3
    # (EXPERIMENTS.md §25, runs/r5_warmup).
    entropy_coef: float = 0.01
    num_learning_epochs: int = 5
    num_mini_batches: int = 4
    learning_rate: float = 1e-3
    adaptation_module_learning_rate: float = 1e-3
    num_adaptation_module_substeps: int = 1
    schedule: str = "adaptive"
    gamma: float = 0.99
    lam: float = 0.95
    desired_kl: float = 0.01
    max_grad_norm: float = 1.0
    # cap of the adaptive-KL LR ratchet (the reference hard-codes 1e-2,
    # ppo.py:117). The HLP's tanh policy blew its output logits to ~300
    # with the LR pegged at 1e-2 (runs/r5_hlp_visible — saturated
    # bang-bang commands, no fine positioning); cap it at 1e-3 there.
    max_lr: float = 1e-2
    # linear entropy-coef ramp 0 -> entropy_coef over this many iterations
    # (0 = constant entropy_coef, reference behavior). See EXPERIMENTS.md
    # §24-25: the ramp gets reference-style sigma maintenance without the
    # early death spiral. Applied by the Runner; direct ppo_update callers
    # get the constant coefficient unless they pass entropy_coef.
    entropy_warmup_iters: int = 300


class PPOState(NamedTuple):
    params: Any
    opt_state: Any
    adapt_opt_state: Any
    lr: jnp.ndarray          # [] adaptive learning rate


class Transition(NamedTuple):
    """One scanned rollout slot (rollout_storage.py:8-24)."""
    obs: jnp.ndarray
    privileged_obs: jnp.ndarray
    obs_history: jnp.ndarray
    actions: jnp.ndarray
    rewards: jnp.ndarray
    dones: jnp.ndarray
    values: jnp.ndarray
    log_prob: jnp.ndarray
    mu: jnp.ndarray
    sigma: jnp.ndarray
    env_bins: jnp.ndarray


def make_optimizers(ppo_args: PPOArgs):
    """Main optimizer: grad-clip + Adam, applied with the carried adaptive
    LR (Adam at lr=1 then scale — identical to Adam at lr). Adaptation
    optimizer: fixed-LR Adam (ppo.py:44-46)."""
    tx = optax.chain(optax.clip_by_global_norm(ppo_args.max_grad_norm),
                     optax.adam(1.0))
    adapt_tx = optax.adam(ppo_args.adaptation_module_learning_rate)
    return tx, adapt_tx


def canonicalize(tree):
    """Strip weak types so jit signatures are stable from the first call
    (weak->strong promotion after one update would force a recompile)."""
    return jax.tree.map(lambda x: jnp.asarray(x, x.dtype)
                        if hasattr(x, "dtype") else x, tree)


def init_ppo_state(key, ac: ActorCritic, ppo_args: PPOArgs,
                   num_obs, num_priv, num_hist) -> PPOState:
    obs = jnp.zeros((1, num_obs))
    priv = jnp.zeros((1, num_priv))
    hist = jnp.zeros((1, num_hist))
    params = ac.init(key, obs, priv, hist)
    tx, adapt_tx = make_optimizers(ppo_args)
    return canonicalize(PPOState(
        params=params,
        opt_state=tx.init(params),
        adapt_opt_state=adapt_tx.init(params),
        lr=jnp.asarray(ppo_args.learning_rate, jnp.float32)))


# ---------------------------------------------------------------------------
def rollout(env, ac: ActorCritic, ppo_args: PPOArgs, params,
            env_state, key, num_steps: int, eval_expert: bool = False
            ) -> Tuple[Any, Transition, Dict[str, jnp.ndarray]]:
    """Collect `num_steps` transitions with the current policy.

    Train envs act stochastically through the teacher policy (alg.act,
    ppo.py:62-74); eval envs (if any) act deterministically through teacher
    or student (Runner.learn, ppo/__init__.py:128-135)."""
    n_train = env.num_train_envs

    def step_fn(carry, _):
        env_state, key = carry
        key, k_sample = jax.random.split(key)
        obs = env_state.obs
        priv = env_state.privileged_obs
        hist = env_state.obs_history

        mean, std = ac.apply(params, obs, priv, method=ActorCritic.distribution)
        noise = jax.random.normal(k_sample, mean.shape)
        sampled = mean + std * noise
        values = ac.apply(params, obs, priv, method=ActorCritic.evaluate)
        log_prob = normal_log_prob(mean, std, sampled)

        if env.num_eval_envs > 0:
            if eval_expert:
                det = ac.apply(params, obs, priv,
                               method=ActorCritic.act_teacher)
            else:
                det = ac.apply(params, obs, hist,
                               method=ActorCritic.act_student)
            idx = jnp.arange(obs.shape[0])[:, None]
            actions = jnp.where(idx < n_train, sampled, det)
        else:
            actions = sampled

        new_env_state, res = env.step(env_state, actions)
        # timeout bootstrap (ppo.py:81-83)
        rewards = res.rew + ppo_args.gamma * values * res.info["time_outs"]

        t = Transition(
            obs=obs, privileged_obs=priv, obs_history=hist,
            actions=actions, rewards=rewards, dones=res.done,
            values=values, log_prob=log_prob, mu=mean, sigma=std,
            env_bins=res.info["env_bins"])
        # keep only scalar/summable metrics in the scanned info
        info = {k: v for k, v in res.info.items()
                if k not in ("env_bins", "time_outs")}
        # env-0 pose log for offline video rendering: ~22 floats/step
        # piggybacked on the training rollout so videos never need a
        # separate rollout (whose slightly-different jit signature cost a
        # fresh multi-minute remote compile mid-run — EXPERIMENTS.md §15)
        if hasattr(new_env_state, "sim"):
            pose = (new_env_state.sim.base_pos[0],
                    new_env_state.sim.base_quat[0],
                    new_env_state.sim.q[0], env_state.env_origins[0])
        else:  # e.g. HLPState: no low-level sim state to render
            pose = ()
        return (new_env_state, key), (t, info, pose)

    (env_state, _), (traj, infos, poses) = jax.lax.scan(
        step_fn, (env_state, key), None, length=num_steps)
    return env_state, traj, infos, poses


def compute_gae(traj: Transition, last_values, gamma: float, lam: float):
    """Reverse-scan GAE (rollout_storage.py:76-90)."""
    def body(carry, t):
        adv_next, v_next = carry
        not_done = 1.0 - t.dones.astype(jnp.float32)
        delta = t.rewards + not_done * gamma * v_next - t.values
        adv = delta + not_done * gamma * lam * adv_next
        return (adv, t.values), adv

    _, advantages = jax.lax.scan(
        body, (jnp.zeros_like(last_values), last_values), traj, reverse=True)
    returns = advantages + traj.values
    return advantages, returns


# ---------------------------------------------------------------------------
def ppo_update(ac: ActorCritic, ppo_args: PPOArgs, state: PPOState,
               traj: Transition, advantages, returns, key,
               num_train_envs: int, num_curriculum_bins: int = 0,
               entropy_coef=None,
               ) -> Tuple[PPOState, Dict[str, jnp.ndarray]]:
    """5 epochs x 4 minibatches over the flattened train-env transitions
    (ppo.py:94-178). Multi-chip gradient reduction needs no explicit
    collectives here: with the env axis sharded and params replicated,
    GSPMD partitions this function and inserts the psums itself
    (parallel/sharding.py, tests/test_sharding.py,
    tests/test_multihost.py)."""
    T = traj.obs.shape[0]
    B_total = T * num_train_envs
    nmb = ppo_args.num_mini_batches
    mb_size = B_total // nmb

    def flat(x):
        return x[:, :num_train_envs].reshape((B_total,) + x.shape[2:])

    data = dict(
        obs=flat(traj.obs), priv=flat(traj.privileged_obs),
        hist=flat(traj.obs_history), actions=flat(traj.actions),
        values=flat(traj.values), log_prob=flat(traj.log_prob),
        mu=flat(traj.mu), sigma=flat(traj.sigma),
        adv=flat(advantages), ret=flat(returns))
    if num_curriculum_bins > 0:
        data["env_bins"] = flat(traj.env_bins)

    # advantage normalization over the whole batch (rollout_storage.py:90)
    a_mean = jnp.mean(data["adv"])
    a_std = jnp.std(data["adv"])
    data["adv"] = (data["adv"] - a_mean) / (a_std + 1e-8)

    # one global permutation reused across epochs (rollout_storage.py:103)
    perm = jax.random.permutation(key, nmb * mb_size)
    chunks = perm.reshape(nmb, mb_size)

    tx, adapt_tx = make_optimizers(ppo_args)

    def loss_fn(params, mb):
        mean, std = ac.apply(params, mb["obs"], mb["priv"],
                             method=ActorCritic.distribution)
        log_prob = normal_log_prob(mean, std, mb["actions"])
        value = ac.apply(params, mb["obs"], mb["priv"],
                         method=ActorCritic.evaluate)
        entropy = normal_entropy(std)

        kl = jnp.mean(normal_kl(mb["mu"], mb["sigma"], mean, std))

        # clamp the log-ratio before exp: inf ratios (far-tail samples after
        # several minibatch updates) would NaN the whole parameter tree
        ratio = jnp.exp(jnp.clip(log_prob - mb["log_prob"], -20.0, 20.0))
        surr = -mb["adv"] * ratio
        surr_clipped = -mb["adv"] * jnp.clip(
            ratio, 1.0 - ppo_args.clip_param, 1.0 + ppo_args.clip_param)
        surrogate_loss = jnp.mean(jnp.maximum(surr, surr_clipped))

        if ppo_args.use_clipped_value_loss:
            v_clipped = mb["values"] + jnp.clip(
                value - mb["values"], -ppo_args.clip_param,
                ppo_args.clip_param)
            v_loss = jnp.maximum((value - mb["ret"]) ** 2,
                                 (v_clipped - mb["ret"]) ** 2).mean()
        else:
            v_loss = jnp.mean((mb["ret"] - value) ** 2)

        # entropy warmup (round 5): a per-iteration traced coefficient —
        # 0 during the fragile early only-positive-clipped regime, then
        # the reference's 0.01 (EXPERIMENTS.md §24: constant 0.01 death-
        # spirals; constant 0 pins sigma at the min_std floor and drags
        # the adaptive LR down)
        ent_coef = (ppo_args.entropy_coef if entropy_coef is None
                    else entropy_coef)
        loss = (surrogate_loss + ppo_args.value_loss_coef * v_loss
                - ent_coef * jnp.mean(entropy))
        return loss, dict(value_loss=v_loss, surrogate_loss=surrogate_loss,
                          kl=jax.lax.stop_gradient(kl))

    def adapt_loss_fn(params, mb):
        pred = ac.apply(params, mb["hist"],
                        method=ActorCritic.student_latent)
        target = jax.lax.stop_gradient(
            ac.apply(params, mb["priv"], method=ActorCritic.teacher_latent))
        return jnp.mean((pred - target) ** 2)

    def minibatch_step(carry, idx):
        params, opt_state, adapt_opt_state, lr = carry
        mb = {k: v[idx] for k, v in data.items()}

        (loss, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, mb)

        # adaptive-KL LR schedule (ppo.py:110-124), applied to this step
        if ppo_args.desired_kl is not None and ppo_args.schedule == "adaptive":
            kl = aux["kl"]
            lr = jnp.where(kl > ppo_args.desired_kl * 2.0,
                           jnp.maximum(1e-5, lr / 1.5), lr)
            lr = jnp.where((kl < ppo_args.desired_kl / 2.0) & (kl > 0.0),
                           jnp.minimum(ppo_args.max_lr, lr * 1.5), lr)

        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: u * lr, updates)
        params = optax.apply_updates(params, updates)

        # adaptation module distillation step (ppo.py:156-170); gated off
        # for the latent-free HLP variant (high_level_policy/ppo.py:157-179)
        a_loss = jnp.asarray(0.0)
        n_adapt = (ppo_args.num_adaptation_module_substeps
                   if ac.args.use_latent else 0)
        resid_sum = jnp.zeros(max(num_curriculum_bins, 1))
        resid_cnt = jnp.zeros(max(num_curriculum_bins, 1))
        for _ in range(n_adapt):
            a_loss_i, a_grads = jax.value_and_grad(adapt_loss_fn)(params, mb)
            if num_curriculum_bins > 0:
                # per-curriculum-bin sysid residual (reference ppo.py:156-164
                # SlotCache logging — with int32 bins, NOT the reference's
                # uint8-truncated indices; EXPERIMENTS.md §10 addendum)
                pred = ac.apply(params, mb["hist"],
                                method=ActorCritic.student_latent)
                target = ac.apply(params, mb["priv"],
                                  method=ActorCritic.teacher_latent)
                residual = jnp.linalg.norm(target - pred, axis=-1)
                bins = mb["env_bins"].astype(jnp.int32)
                resid_sum = resid_sum.at[bins].add(residual)
                resid_cnt = resid_cnt.at[bins].add(1.0)
            a_updates, adapt_opt_state = adapt_tx.update(
                a_grads, adapt_opt_state, params)
            params = optax.apply_updates(params, a_updates)
            a_loss = a_loss + a_loss_i
        a_loss = a_loss / max(n_adapt, 1)

        metrics = dict(value_loss=aux["value_loss"],
                       surrogate_loss=aux["surrogate_loss"],
                       adaptation_loss=a_loss, kl=aux["kl"], lr=lr,
                       sysid_residual_sum=resid_sum,
                       sysid_residual_count=resid_cnt)
        return (params, opt_state, adapt_opt_state, lr), metrics

    # epochs x minibatches flattened into one scan
    idx_seq = jnp.tile(chunks, (ppo_args.num_learning_epochs, 1))
    carry = (state.params, state.opt_state, state.adapt_opt_state, state.lr)
    carry, metrics = jax.lax.scan(minibatch_step, carry, idx_seq)
    params, opt_state, adapt_opt_state, lr = carry

    resid_sum = metrics.pop("sysid_residual_sum")
    resid_cnt = metrics.pop("sysid_residual_count")
    mean_metrics = {f"mean_{k}" if "loss" in k else k: jnp.mean(v)
                    for k, v in metrics.items()}
    mean_metrics["lr"] = lr
    # Exploration-noise diagnostic: the learned std drives both failure
    # modes seen in rounds 2-3 (ent=0.01 inflates it until the robot
    # flails; ent=0 collapses it, which drags the adaptive-KL LR down
    # as sigma^2 — EXPERIMENTS.md §13). Logged every iteration so a run's
    # sigma trajectory is visible without exhuming checkpoints.
    mean_metrics["mean_noise_std"] = jnp.mean(params["params"]["std"])
    if num_curriculum_bins > 0:
        # per-bin aggregates over all minibatches (consumed by the Runner's
        # SlotCache -> curriculum/info.pkl; reference ppo/__init__.py:197-201)
        mean_metrics["sysid_residual_sum"] = jnp.sum(resid_sum, axis=0)
        mean_metrics["sysid_residual_count"] = jnp.sum(resid_cnt, axis=0)
    return PPOState(params, opt_state, adapt_opt_state, lr), mean_metrics


# ---------------------------------------------------------------------------
def _aggregate_rollout_metrics(traj: Transition, infos):
    """Episode-sum accumulators add over the T axis; gauges take the last."""
    rollout_metrics = {}
    for k, v in infos.items():
        if "/sum" in k or k.endswith("_count"):
            rollout_metrics[k] = jnp.sum(v, axis=0)
        else:
            rollout_metrics[k] = v[-1]
    rollout_metrics["mean_reward"] = jnp.mean(traj.rewards)
    rollout_metrics["mean_episode_dones"] = jnp.mean(
        traj.dones.astype(jnp.float32))
    return rollout_metrics


def make_train_functions(env, ac: ActorCritic, ppo_args: PPOArgs,
                         num_steps_per_env: int, eval_expert: bool = False):
    """The two halves of a training iteration as separate functions:
    (rollout+GAE, update). Used directly by the split pipeline and composed
    by :func:`make_train_iteration`."""

    def rollout_gae(env_state, params, key):
        env_state, traj, infos, poses = rollout(
            env, ac, ppo_args, params, env_state, key,
            num_steps_per_env, eval_expert)
        last_values = ac.apply(params, env_state.obs,
                               env_state.privileged_obs,
                               method=ActorCritic.evaluate)
        advantages, returns = compute_gae(
            traj, last_values, ppo_args.gamma, ppo_args.lam)
        metrics = _aggregate_rollout_metrics(traj, infos)
        # full [T,...] pose log under reserved keys the Runner pops into
        # its host-side video ring buffer (never logged as scalars)
        for name, arr in zip(("pos", "quat", "q", "origin"), poses):
            metrics[f"_render/{name}"] = arr
        return (env_state, traj, advantages, returns, metrics)

    def update(ppo_state: PPOState, traj, advantages, returns, key,
               entropy_coef=None):
        nbins = (env.curriculum_grid.num_bins
                 if getattr(env, "curriculum_grid", None) is not None
                 and ac.args.use_latent else 0)
        return ppo_update(ac, ppo_args, ppo_state, traj, advantages,
                          returns, key, env.num_train_envs,
                          num_curriculum_bins=nbins,
                          entropy_coef=entropy_coef)

    return rollout_gae, update


def make_train_iteration(env, ac: ActorCritic, ppo_args: PPOArgs,
                         num_steps_per_env: int, eval_expert: bool = False,
                         split: bool = False):
    """One full training iteration: rollout + GAE + update
    (the per-iteration block of Runner.learn, ppo/__init__.py:123-203).

    split=False fuses everything into one jittable function (jit it
    yourself). split=True returns a host-side composition of two separately
    jitted halves — all data stays device-resident, but each compilation
    unit is smaller (the monolithic program occasionally compiles to a
    poorly scheduled executable on some toolchains)."""
    rollout_gae, update = make_train_functions(
        env, ac, ppo_args, num_steps_per_env, eval_expert)

    if split:
        rollout_gae_j = jax.jit(rollout_gae)
        update_j = jax.jit(update)

        def train_iteration_split(env_state, ppo_state: PPOState, key,
                                  entropy_coef=None):
            k_roll, k_update = jax.random.split(key)
            env_state, traj, adv, ret, rollout_metrics = rollout_gae_j(
                env_state, ppo_state.params, k_roll)
            if entropy_coef is None:
                ppo_state, update_metrics = update_j(
                    ppo_state, traj, adv, ret, k_update)
            else:
                ppo_state, update_metrics = update_j(
                    ppo_state, traj, adv, ret, k_update,
                    entropy_coef=entropy_coef)
            return env_state, ppo_state, {**rollout_metrics,
                                          **update_metrics}

        return train_iteration_split

    def train_iteration(env_state, ppo_state: PPOState, key,
                        entropy_coef=None):
        k_roll, k_update = jax.random.split(key)
        env_state, traj, adv, ret, rollout_metrics = rollout_gae(
            env_state, ppo_state.params, k_roll)
        ppo_state, update_metrics = update(ppo_state, traj, adv, ret,
                                           k_update,
                                           entropy_coef=entropy_coef)
        return env_state, ppo_state, {**rollout_metrics, **update_metrics}

    return train_iteration
