"""TPU-native medical image analysis framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Event-AHU/Medical_Image_Analysis (X-ray report generation & pretraining):

- ``ops``      Pallas TPU kernels + jnp reference implementations
               (selective scan, cross scan, causal conv, attention).
- ``models``   Flax modules: Mamba/ARM, VMamba (SS2D/VSSM), Swin, MAE-ViT,
               AR-pretrain VisionMamba, Q-Former, Hopfield, R-GCN, hybrid
               gated cross-attention decoder, CLIP heads, LLM decoder, and
               the task models (R2GenCSR, MambaXray-VL, AM-MRG, R2GenKG,
               EMRRG, SwinCheX/DP classifiers).
- ``parallel`` Device mesh / sharding / pjit train-step factory.
- ``data``     Annotation parsing, report cleaning, image preprocessing,
               batching (host-side, XLA-friendly fixed shapes).
- ``train``    Recipes: MAE pretrain, AR pretrain, CLIP align, MRG SFT,
               classification. Optimizers & schedules.
- ``evalx``    NLG metrics (BLEU, ROUGE-L, CIDEr, METEOR-lite) and
               classification metrics, pure Python.
- ``peft``     LoRA and partial-SSM-LoRA as functional param-tree
               transforms.
- ``ckpt``     Orbax checkpointing, trainable-only "delta" saves, torch
               checkpoint import with key-remapping surgeries.
"""

__version__ = "0.1.0"
