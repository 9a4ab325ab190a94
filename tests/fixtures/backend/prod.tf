terraform {
  required_version = ">= 1.5.0"

  backend "s3" {
    bucket  = "acme-tf-state-prod"
    key     = "prod/terraform.tfstate"
    region  = "us-west-2"
    encrypt = true
  }
}
