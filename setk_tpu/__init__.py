"""setk_tpu — TPU-native speech-enhancement front-end.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of funcwj/setk
(see SURVEY.md): STFT/iSTFT, T-F masks, mask-weighted spatial covariance,
adaptive/fixed beamforming, CGMM/CACGMM spatial clustering, WPE/WPD
dereverberation, AuxIVA, SRP-PHAT/ML/MUSIC localization, OM-LSA noise
suppression, image-method RIR simulation and multi-channel mixing, with
batched/sharded execution over TPU meshes.
"""

__version__ = "0.1.0"
