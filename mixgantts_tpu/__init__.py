"""mixgantts_tpu — a TPU-native (JAX/XLA/Pallas/pjit) re-implementation of the
MixGAN-TTS capability set.

MixGAN-TTS is a non-autoregressive text-to-speech acoustic model combining a
FastSpeech2-style linguistic encoder, a few-step DDPM diffusion mel decoder
trained adversarially against a JCU discriminator, and an active shallow
diffusion two-stage training scheme (reference: MaxMax2016/MixGAN-TTS).

This package is a ground-up TPU-first design: pure-functional flax modules over
pytrees, one mask polarity (True = valid) everywhere, static shapes with length
bucketing, `lax`-native sequence ops instead of Python loops, optax optimizers,
orbax checkpoints, and `jax.sharding.Mesh` data parallelism.
"""

__version__ = "0.1.0"
