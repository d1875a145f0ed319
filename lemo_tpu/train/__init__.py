"""Training loops for the learned motion priors."""
