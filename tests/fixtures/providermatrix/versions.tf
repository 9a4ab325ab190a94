terraform {
  required_providers {
    aws = {
      source  = "hashicorp/aws"
      version = "~> 5.0"
    }

    # legacy single-string constraint form
    random = ">= 3.0"

    # constrained but never configured or used anywhere in the corpus
    archive = {
      source  = "hashicorp/archive"
      version = "~> 2.4"
    }
  }
}
