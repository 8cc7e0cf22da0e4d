"""Statistical models: k-mer depth mixture (ModelDist), Bayesian genotyper."""
