terraform {
  required_providers {
    aws = { source = "hashicorp/aws" }
  }
}

provider "aws" {
  region = "us-west-2"
}

provider "aws" {
  alias   = "east"
  region  = "us-east-1"
  version = "~> 4.0"
}

variable "instance_type" {
  type        = string
  description = "EC2 type"
  default     = "t2.micro"
  sensitive   = true
  validation {
    condition     = length(var.instance_type) > 0
    error_message = "required"
  }
}

locals {
  owner = "team-a"
}

locals {
  cost_center = 42
  tags        = { env = "dev" }
}

resource "aws_instance" "app_server" {
  ami           = "ami-830c94e3"
  instance_type = var.instance_type
  count         = 2
  depends_on    = [aws_s3_bucket.b]
  lifecycle {
    create_before_destroy = true
  }
  tags = { Name = "ExampleAppServerInstance" }
}

resource "aws_s3_bucket" "b" {
  bucket   = "my-app-bucket"
  count    = local.cost_center
  provider = aws.east
}

resource "aws_sqs_queue" "empty" {
}

data "aws_ami" "ubuntu" {
  most_recent = true
  filter {
    name   = "name"
    values = ["ubuntu/images/*"]
  }
  filter {
    name   = "virtualization-type"
    values = ["hvm"]
  }
}

module "vpc" {
  source   = "terraform-aws-modules/vpc/aws"
  version  = "5.0.0"
  cidr     = "10.0.0.0/16"
  for_each = toset(["a", "b"])
}

output "bucket_arn" {
  value       = aws_s3_bucket.b.arn
  description = "ARN"
  sensitive   = true
  depends_on  = [aws_s3_bucket.b]
}
