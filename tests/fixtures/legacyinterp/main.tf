variable "region" {
  type    = string
  default = "us-east-1"
}

variable "env" {
  type = string
}

locals {
  base_name = "acme"
}

resource "aws_instance" "legacy_both" {
  ami               = "${var.region}"
  availability_zone = "${var.region}"
  instance_type     = "t3.micro"
}

resource "aws_s3_bucket" "legacy_one" {
  bucket = "${local.base_name}"
  acl    = "private"
}

resource "aws_s3_bucket" "modern" {
  bucket = local.base_name
  tags = {
    Env = var.env
  }
}

resource "aws_sns_topic" "composite_ok" {
  name = "${var.env}-alerts"
}

output "legacy_out" {
  value = "${aws_instance.legacy_both.id}"
}

output "modern_out" {
  value = aws_instance.legacy_both.id
}
