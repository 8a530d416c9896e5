from hemx.models.plugin import ModelPlugin, get_model, available_models
