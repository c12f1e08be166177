"""Model facade: wires data + config into constants and posterior functions.

Host-level counterpart of the reference's ``Model`` (sbayes/model/model.py):
``model.likelihood(state)`` / ``model.prior(state)`` / ``model(state)``,
evaluated by one jitted full-recompute on device.
"""
from __future__ import annotations

import jax

from sbayes_tpu.config.schema import ModelConfig
from sbayes_tpu.data.loader import Data
from sbayes_tpu.model.constants import ModelConstants, build_model_constants
from sbayes_tpu.model.posterior import Posterior


class Model:
    def __init__(self, data: Data, config: ModelConfig, n_clusters=None):
        self.data = data
        self.config = config
        self.confounders = data.confounders
        self.consts: ModelConstants = build_model_constants(data, config, n_clusters=n_clusters)
        self.shapes = self.consts.shapes
        self.n_clusters = self.shapes.n_clusters
        self.min_size = self.consts.min_size
        self.max_size = self.consts.max_size
        self.posterior = Posterior(self.consts)
        self._parts_jit = jax.jit(self.posterior.parts)

    def likelihood(self, state) -> float:
        return float(self._parts_jit(state).log_lh)

    def prior(self, state) -> float:
        return float(self._parts_jit(state).log_prior)

    def parts(self, state):
        return self._parts_jit(state)

    def __call__(self, state) -> float:
        p = self._parts_jit(state)
        return float(p.log_lh + p.log_prior)

    def get_setup_message(self) -> str:
        c = self.consts
        msg = "\nModel\n##########################################\n"
        msg += f"Number of clusters: {self.n_clusters}\n"
        msg += (
            f"Clusters have a minimum size of {c.min_size} and a maximum size of {c.max_size}\n"
        )
        msg += f"Geo-prior: {c.geo.prior_type}\n"
        msg += f"Prior on cluster size: {c.size_prior_type}\n"
        msg += f"Prior on weights: {'uniform' if c.weights_prior_uniform else 'dirichlet'}\n"
        return msg
