"""genima_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of Genima ("Generative Image as Action Models", CoRL 2024).

The framework rebuilds, TPU-first, the full Genima pipeline:

* a ControlNet-fine-tuned Stable Diffusion (SD-turbo) model that *draws*
  future joint positions as colored spheres onto 2x2-tiled 4-camera RGB
  observations (reference: ``diffusion/train_controlnet_genima.py``),
* an ACT-style CVAE transformer controller mapping target images +
  proprioception + CLIP language embeddings to 20-step chunks of absolute
  joint-position actions (reference: ``controller/method/genima_act.py``),
* the closed-loop evaluation harness against RLBench
  (reference: ``controller/eval_genima.py``), and
* the sphere-rendering dataset builder (reference: ``render/render_data.py``)
  re-done as vectorized XLA image ops.

Subpackages
-----------
core        config / mesh / rng / checkpointing / logging
nn          flax modules: unet, controlnet, vae, clip text, resnet18, ACT
kernels     pallas TPU kernels (flash attention, fused norm-act)
diffusion   schedulers, jitted pipelines, ControlNet fine-tune trainer
control     ACT policy, replay buffer, BC trainer
data        dataset readers, tiling, tokenizer, host loader, augmentations
rendering   XLA sphere renderer + dataset builder
envs        gym-compatible env API, wrappers, fake env for CI
eval        closed-loop eval harness
weights     torch/diffusers checkpoint import
cli         entry points mirroring the reference's CLIs
"""

__version__ = "0.1.0"
