"""Inference engines: SMC with data annealing, involutive MCMC moves on
kernel structures, HMC parameter rejuvenation, greedy AIC search.

Reference: /root/reference/src/Inference.jl and included files.
"""
