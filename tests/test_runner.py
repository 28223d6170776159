"""Runner end-to-end: training driver, metrics.pkl layout, checkpoint +
bit-exact resume, eval-env split."""

import os
import pickle

import jax
import numpy as np
import pytest

from rapid_locomotion_rl_tpu.config import config_mini_cheetah
from rapid_locomotion_rl_tpu.envs.legged_robot import LeggedRobotEnv
from rapid_locomotion_rl_tpu.learn.runner import Runner, RunnerArgs


def tiny_cfg(num_envs=8, num_eval=0):
    c = config_mini_cheetah()
    c.env.num_envs = num_envs
    c.env.num_eval_envs = num_eval
    c.terrain.mesh_type = "plane"
    c.terrain.teleport_robots = False
    return c


@pytest.mark.slow
def test_runner_learn_and_artifacts(tmp_path):
    env = LeggedRobotEnv(tiny_cfg())
    runner = Runner(env, logdir=str(tmp_path),
                    runner_args=RunnerArgs(num_steps_per_env=4, log_freq=1,
                                           save_interval=2))
    runner.learn(3, init_at_random_ep_len=True, eval_freq=2)

    # parameters snapshot
    assert os.path.exists(tmp_path / "parameters.json")
    # metrics.pkl: list of rows with reference-style keys
    with open(tmp_path / "metrics.pkl", "rb") as f:
        rows = pickle.load(f)
    assert len(rows) >= 3
    keys = set().union(*[r.keys() for r in rows])
    assert "time_iter/mean" in keys
    assert any(k.startswith("mean_value_loss") for k in keys)
    # curriculum dump
    with open(tmp_path / "curriculum/info.pkl", "rb") as f:
        cur = pickle.load(f)
    assert isinstance(cur, list) and "weights" in cur[0]
    # checkpoints incl. deployment export
    ck = tmp_path / "checkpoints"
    assert (ck / "train_state_last.pkl").exists()
    assert (ck / "ac_weights_last.pkl").exists()
    assert (ck / "student_policy_latest.params.pkl").exists()


@pytest.mark.slow
def test_runner_resume_bit_exact(tmp_path):
    env = LeggedRobotEnv(tiny_cfg())
    args = RunnerArgs(num_steps_per_env=4, log_freq=100, save_interval=100)

    r1 = Runner(env, logdir=str(tmp_path / "a"), runner_args=args, seed=3)
    r1.learn(4, eval_freq=100)
    leaf_a = np.asarray(jax.tree.leaves(r1.ppo_state.params)[0])

    # train 2, checkpoint, resume into a fresh runner, train 2 more
    r2 = Runner(env, logdir=str(tmp_path / "b"), runner_args=args, seed=3)
    r2.learn(2, eval_freq=100)
    r2.save_checkpoint(99)
    r3 = Runner(env, logdir=str(tmp_path / "c"), runner_args=args, seed=3)
    r3.load_checkpoint(str(tmp_path / "b/checkpoints/train_state_last.pkl"))
    r3.current_learning_iteration = 0  # iterate 2 more
    r3.learn(2, eval_freq=100)
    leaf_c = np.asarray(jax.tree.leaves(r3.ppo_state.params)[0])
    np.testing.assert_array_equal(leaf_a, leaf_c)


@pytest.mark.slow
def test_runner_eval_split(tmp_path):
    env = LeggedRobotEnv(tiny_cfg(num_envs=8, num_eval=2))
    assert env.num_train_envs == 6 and env.num_eval_envs == 2
    runner = Runner(env, logdir=str(tmp_path),
                    runner_args=RunnerArgs(num_steps_per_env=4, log_freq=1))
    runner.learn(2, eval_freq=1)
    # eval metric channel exists after enough resets; at minimum no crash
    assert runner.env_state.obs.shape == (8, 42)
