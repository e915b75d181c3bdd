"""Config-as-code experiment files. Each module exposes ``run(settings)``
(reference ``train_settings/`` contract, SURVEY.md section 2.6)."""
