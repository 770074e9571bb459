"""End-to-end pipelines: template onboarding, ISM -> PEM inference, demo."""
