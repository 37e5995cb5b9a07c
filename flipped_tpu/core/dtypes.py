"""Dtype policy.

The reference runs frozen weights in fp16 with fp32 softmax/norm islands and
fp32 trainables (llama_vqa.py:63-77, model.py:41, 115, 120). On TPU the
equivalent policy is bfloat16 frozen weights + bf16 matmuls with f32
normalization/softmax/losses, and f32 trainable adapters — bf16 needs no loss
scaler (the reference's NativeScaler, util/misc.py:253-294, is dropped).
"""
import jax.numpy as jnp

# Frozen backbone weights + activations on the matmul path.
COMPUTE = jnp.bfloat16
# Trainable adapter/gate/projection parameters and optimizer state.
PARAM = jnp.float32
# Softmax, RMSNorm statistics, losses.
ACCUM = jnp.float32
