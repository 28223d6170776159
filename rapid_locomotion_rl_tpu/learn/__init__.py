"""The PPO actor-learner (rollout-as-scan, fused update) and runner."""
