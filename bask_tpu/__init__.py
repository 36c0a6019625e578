"""bask-tpu: TPU-native fully-Bayesian Bayesian optimization in JAX.

A from-scratch rebuild of the capabilities of kiudee/bayes-skopt ("bask"):
fully-Bayesian Gaussian-process regression (MCMC over kernel
hyperparameters), marginalized acquisition functions, an ask/tell
Optimizer, and a sklearn-compatible BayesSearchCV — designed TPU-first
(vmapped walker ensembles, fused acquisition passes, shardable over a
``jax.sharding.Mesh``).
"""

__version__ = "0.1.0"
