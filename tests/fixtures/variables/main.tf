variable "region" {
  type        = string
  description = "deploy region"
  default     = "us-west-2"
}

variable "instance_type" {
  type    = string
  default = "t3.micro"
}

variable "zone_suffix" {
  type    = string
  default = "a"
}

variable "bucket_name" {
  type = string
}

variable "retention_days" {
  type    = number
  default = 30
}

variable "environment" {
  type    = string
  default = "dev"
  validation {
    condition     = length(var.environment) > 0
    error_message = "environment must be non-empty"
  }
}

provider "aws" {
  region = var.region
}

locals {
  az = "${var.region}${var.zone_suffix}"
}

resource "aws_instance" "web" {
  ami           = "ami-12345678"
  instance_type = var.instance_type
}

output "web_az" {
  value = local.az
}
