"""Model families (L4): per-model Feynman–Kac components and proposal
factories for the auxiliary samplers, covering the reference's capability
surface (SURVEY §2.3): stochastic volatility, spatio-temporal Student-t,
stochastic Lorenz-63 with parameter learning, rare-event AR(1), plus a
theta-logistic population model (BASELINE config #3)."""
