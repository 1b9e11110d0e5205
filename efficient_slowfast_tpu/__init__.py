"""TPU-native Efficient-SlowFast: JAX/XLA/Pallas video action recognition.

A ground-up rebuild of weidafeng/Efficient-SlowFast (PySlowFast + CMDA +
efficient two-pathway backbones) designed TPU-first: channels-last tensors,
one jitted train step, pjit/shard_map data parallelism over a device mesh,
fused on-device preprocessing, and a native C++ FFmpeg decode stage.
"""

__version__ = "1.0.0"
