"""bio1 evolutionary solver — implemented in a later milestone."""
