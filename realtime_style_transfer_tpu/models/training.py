"""Training model: jitted train/eval steps over the inference graph + loss tower.

Re-design of ``/root/reference/realtime_style_transfer/models/
styleTransferTrainingModel.py:11-70``: the training model IS the inference model
(built with ``num_styles=1``, reference ``:44-49``) plus a frozen loss tower; the
per-component loss dict doubles as the metrics dict (reference ``compute_metrics``).

TPU-first shape: instead of a Keras ``Model.fit`` override, this module builds pure
functions — ``train_step(state, batch) -> (state, metrics)`` and
``eval_step(state, batch) -> metrics`` — that the trainer jits (optionally under a
device mesh; see ``parallel.train``).  Frozen loss/depth params live OUTSIDE the
optimizer state and are closed over as constants, so XLA bakes them in.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from ..config import ShapeConfig
from .depth import MidasLite, make_depth_loss_fn
from .inference import StyleTransferInference, make_inference_model
from .losses import LOSS_EXTRACTORS, make_style_loss_function


@flax.struct.dataclass
class TrainState:
    """Trainable variables + optimizer + BatchNorm running stats."""

    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


class StyleTransferTrainingModel:
    """Bundles the inference module, frozen loss tower, and optimizer.

    ``loss_extractor`` is one of ``{"vgg", "mobilenet", "dummy"}``.
    """

    def __init__(
        self,
        config: ShapeConfig,
        *,
        loss_extractor: str = "vgg",
        with_depth_loss: Optional[bool] = None,
        depth_variables: Optional[Any] = None,
        dtype: jnp.dtype = jnp.float32,
        use_pallas: bool = False,
        remat: bool = False,
        tower_mode: str = "split",
        optimizer: Optional[optax.GradientTransformation] = None,
        rng: Optional[jax.Array] = None,
    ):
        """``remat=True`` rematerializes the forward under grad (jax.checkpoint):
        trades ~1 extra forward pass for dropping all transfer-net activation
        residuals — the HBM lever for large batches/resolutions."""
        self.config = config
        # Training always builds the single-style inference graph
        # (reference styleTransferTrainingModel.py:44-49).
        train_config = (
            config if config.num_styles == 1
            else dataclasses.replace(config, num_styles=1)
        )
        self.train_config = train_config
        self.model: StyleTransferInference = make_inference_model(
            train_config, dtype=dtype, use_pallas=use_pallas
        )
        self.remat = remat
        self.with_depth_loss = (
            config.with_depth_loss if with_depth_loss is None else with_depth_loss
        )
        # Keras RMSprop defaults (reference train_network.py:102): lr 1e-3, rho 0.9.
        self.optimizer = optimizer or optax.rmsprop(
            learning_rate=1e-3, decay=0.9, eps=1e-7
        )

        rng = rng if rng is not None else jax.random.PRNGKey(0)
        rng, loss_rng, depth_rng = jax.random.split(rng, 3)
        self._init_rng = rng

        extractor_cls = LOSS_EXTRACTORS[loss_extractor]
        self.loss_module = extractor_cls(dtype=dtype)
        dummy_img = jnp.zeros((1,) + train_config.output_shape, jnp.float32)
        self.loss_variables = jax.jit(self.loss_module.init)(loss_rng, dummy_img)

        depth_loss_fn = None
        if self.with_depth_loss:
            if depth_variables is not None:
                # Pretrained MidasLite (tools/pretrain_depth.py, incl. the
                # bundled synthetic-pretrained weights) — the supported path;
                # random init is only meaningful for shape/plumbing tests.
                # The module width follows the checkpoint.
                from ..depth_pretrain import depth_base_filters

                self.depth_module = MidasLite(
                    dtype=dtype, base_filters=depth_base_filters(depth_variables))
                self.depth_variables = depth_variables
            else:
                import logging

                logging.getLogger(__name__).warning(
                    "depth loss enabled WITHOUT pretrained weights: the depth "
                    "term is a random signal (pass depth_variables / "
                    "--depth_checkpoint; see tools/pretrain_depth.py)"
                )
                self.depth_module = MidasLite(dtype=dtype)
                dummy_depth = jnp.zeros((1, 384, 384, 3), jnp.float32)
                self.depth_variables = jax.jit(self.depth_module.init)(
                    depth_rng, dummy_depth
                )
            depth_apply = lambda imgs: self.depth_module.apply(self.depth_variables, imgs)
            depth_loss_fn = make_depth_loss_fn(depth_apply)
        else:
            self.depth_module = None
            self.depth_variables = None

        extractor_apply = lambda imgs: self.loss_module.apply(self.loss_variables, imgs)
        # tower_mode: how the three extractor invocations are scheduled
        # (split/batched/scan — value- and gradient-identical; see
        # losses.make_style_loss_function and tools/bench_train_step.py)
        self.compute_loss = make_style_loss_function(
            extractor_apply, self.loss_module.factors, depth_loss_fn,
            tower_mode=tower_mode,
        )

    # ---- state ------------------------------------------------------------

    def init_state(self, rng: Optional[jax.Array] = None) -> TrainState:
        rng = rng if rng is not None else self._init_rng
        element, _ = self.train_config.get_dummy_input_element()
        variables = self.model.init(
            rng, jnp.asarray(element["content"]), jnp.asarray(element["style"]),
            train=False,
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.optimizer.init(params)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
        )

    # ---- steps ------------------------------------------------------------

    def loss_and_metrics(
        self, params, batch_stats, batch, *, train: bool
    ) -> Tuple[jnp.ndarray, Tuple[Dict[str, jnp.ndarray], Any]]:
        inputs, ground_truth = batch
        kwargs = {}
        if "style_weights" in inputs:
            kwargs["style_weights"] = inputs["style_weights"]
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            def forward(variables, content, style, style_weights=None):
                kw = {} if style_weights is None else {"style_weights": style_weights}
                return self.model.apply(
                    variables, content, style, train=True,
                    mutable=["batch_stats"], **kw,
                )

            if self.remat:
                forward = jax.checkpoint(forward)
            prediction, mutated = forward(
                variables, inputs["content"], inputs["style"],
                kwargs.get("style_weights"),
            )
            new_batch_stats = mutated["batch_stats"]
        else:
            prediction = self.model.apply(
                variables, inputs["content"], inputs["style"], train=False, **kwargs
            )
            new_batch_stats = batch_stats
        losses = self.compute_loss(prediction, ground_truth)
        total = jnp.mean(losses["loss"])
        return total, (losses, new_batch_stats)

    def train_step(
        self, state: TrainState, batch
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        grad_fn = jax.value_and_grad(
            lambda p: self.loss_and_metrics(p, state.batch_stats, batch, train=True),
            has_aux=True,
        )
        (_, (losses, new_batch_stats)), grads = grad_fn(state.params)
        updates, new_opt_state = self.optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        metrics = {name: jnp.mean(val) for name, val in losses.items()}
        return (
            TrainState(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_batch_stats,
                opt_state=new_opt_state,
            ),
            metrics,
        )

    def eval_step(self, state: TrainState, batch) -> Dict[str, jnp.ndarray]:
        _, (losses, _) = self.loss_and_metrics(
            state.params, state.batch_stats, batch, train=False
        )
        return {name: jnp.mean(val) for name, val in losses.items()}

    def jitted_train_step(self, donate: bool = True) -> Callable:
        return jax.jit(
            self.train_step, donate_argnums=(0,) if donate else ()
        )

    def jitted_eval_step(self) -> Callable:
        return jax.jit(self.eval_step)

    # ---- inference passthroughs --------------------------------------------

    def predict(self, state: TrainState, inputs) -> jnp.ndarray:
        kwargs = {}
        if "style_weights" in inputs:
            kwargs["style_weights"] = inputs["style_weights"]
        return self.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            inputs["content"], inputs["style"], train=False, **kwargs,
        )


def make_style_transfer_training_model(
    config: ShapeConfig, **kwargs
) -> StyleTransferTrainingModel:
    """Factory mirroring reference ``make_style_transfer_training_model``."""
    return StyleTransferTrainingModel(config, **kwargs)
